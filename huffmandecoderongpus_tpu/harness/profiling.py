"""Per-stage profiling of the device pipelines.

Role parity with the reference's device-event profiling: the OpenCL build
accumulates per-kernel times (initbitsindex_time ... findmax_time,
openclapproach.c:273-283,414-424,704-714,826-836,908-918,972-983) and phase
accounting for build/buffer/memcpy time (openclapproach.c:21,240-243).
Here: each pipeline stage is jitted separately and timed with a 1-element
data-dependent readback fence (`block_until_ready` alone can lie through
this environment's device relay), plus a `jax.profiler` trace helper for
full XLA timelines.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


def _fence(x) -> None:
    np.asarray(x).reshape(-1)[:1]


def _time_stage(fn, *args, reps: int = 5) -> tuple[float, object]:
    out = fn(*args)
    _fence(out[0] if isinstance(out, tuple) else out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _fence(out[0] if isinstance(out, tuple) else out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def profile_speculative(hf, reps: int = 5) -> dict[str, float]:
    """Stage breakdown of the speculative pipeline (decodeAllBits /
    makebigtable / index-query stages of ops/speculative.py)."""
    import jax
    import jax.numpy as jnp

    from huffmandecoderongpus_tpu.ops.lut import build_decode_lut
    from huffmandecoderongpus_tpu.ops.speculative import (
        extract_windows,
        make_plan,
    )
    from huffmandecoderongpus_tpu.huffio.bitio import payload_to_words_u32

    lut = build_decode_lut(hf.tree)
    plan = make_plan(hf.bits, hf.uncompressed_size, lut.height)
    words = jnp.asarray(payload_to_words_u32(hf.payload, hf.bits, extra_words=1))
    lut_sym, lut_len = jnp.asarray(lut.sym), jnp.asarray(lut.length)
    bits, size, height, levels = plan.bits, plan.size, plan.height, plan.levels

    @jax.jit
    def stage1(words, lut_sym, lut_len):
        b = jnp.arange(bits, dtype=jnp.int32)
        win = extract_windows(words, b, height).astype(jnp.int32)
        ln = jnp.take(lut_len, win, mode="clip")
        sym = jnp.take(lut_sym, win, mode="clip")
        return jnp.where(b + ln <= bits, ln, -1), sym

    @jax.jit
    def doubling(step0):
        b = jnp.arange(bits, dtype=jnp.int32)
        steps = [step0]
        for _ in range(max(levels - 1, 0)):
            s = steps[-1]
            t = b + s
            tc = jnp.clip(t, 0, bits - 1)
            w = jnp.take(s, tc, mode="clip")
            ok = (s != -1) & (t < bits) & (w != -1) & (t + w <= bits)
            steps.append(jnp.where(ok, s + w, -1))
        return tuple(steps)

    @jax.jit
    def query(steps, sym):
        i = jnp.arange(size, dtype=jnp.int32)
        pos = jnp.zeros(size, dtype=jnp.int32)
        for k in range(levels - 1, -1, -1):
            delta = jnp.take(steps[k], pos, mode="clip")
            take = ((i >> k) & 1) == 1
            pos = jnp.where(take, pos + jnp.maximum(delta, 0), pos)
        return jnp.take(sym, pos, mode="clip")

    report = {}
    report["decodeAllBits"], (step0, sym) = _time_stage(
        stage1, words, lut_sym, lut_len, reps=reps)
    report["makebigtable"], steps = _time_stage(doubling, step0, reps=reps)
    report["index_query"], _ = _time_stage(query, steps, sym, reps=reps)
    report["total"] = sum(report.values())
    return report


def profile_lanedfa(hf, lanes: int | None = None, reps: int = 5) -> dict[str, float]:
    """Stage breakdown of the lane-DFA decoder (discovery / compose / main
    scan / host compaction)."""
    import jax.numpy as jnp

    from huffmandecoderongpus_tpu.ops import lanedfa as ld

    dfa = ld.build_lane_dfa(hf.tree)
    H = max(dfa.height, 1)
    G = ld.pick_lanes(hf.bits) if lanes is None else int(lanes)
    G = max(1, min(G, hf.bits // H if hf.bits >= H else 1))

    report = {}
    t0 = time.perf_counter()
    mat, B = ld.bits_matrix(hf.payload, hf.bits, G, H)
    report["host_bit_matrix"] = time.perf_counter() - t0
    bits_t = jnp.asarray(mat)
    tab = jnp.asarray(dfa.entry)

    report["candidate_scan"], (cnt, ex) = _time_stage(
        lambda b, t: ld._candidate_scan(b, t, B=B, H=H, N=hf.bits, G=G),
        bits_t, tab, reps=reps)
    report["compose"], (entry_off, base, n, total) = _time_stage(
        lambda c, e: ld._compose(c, e, G=G), cnt, ex, reps=reps)
    report["main_scan"], (sym, valid) = _time_stage(
        lambda b, t, o: ld._lane_scan(b, t, o, B=B, H=H, N=hf.bits, G=G),
        bits_t, tab, entry_off, reps=reps)
    t0 = time.perf_counter()
    sym_t = np.asarray(sym).T
    valid_t = np.asarray(valid).T
    _ = sym_t[valid_t]
    report["host_compaction"] = time.perf_counter() - t0
    report["total"] = sum(report.values())
    return report


def profile_widescan(hf, lanes: int | None = None,
                     reps: int = 5) -> dict[str, float]:
    """Stage breakdown of the wide-lane fused decoder (K1 scan+discovery /
    K2 compose / K3 fix-splice / K4 compaction), by timing nested
    prefixes of the program — each prefix is fenced on a scalar
    data-dependent on its last kernel, and the deltas attribute time to
    the stages without staging intermediates through the host."""
    import functools

    import jax
    import jax.numpy as jnp

    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    st = ws.stage_widescan_inputs(hf, lanes=lanes)  # EnvelopeError -> caller
    p = st["plan"]
    H, md, G = st["H"], st["md"], p["G"]
    R = G // 128
    interp = jax.default_backend() != "tpu"  # off-TPU: interpret-mode run
    kw = dict(B=p["B"], H=H, G=G, steps=p["steps"], steps_p=p["steps_p"],
              SEG=p["SEG"], UNROLL=p["UNROLL"], md=md, RB=p["RB"],
              interpret=interp)
    if st["chunk2"]:
        k1 = functools.partial(ws.k1_scan2, C0=st["C0"], C1=st["C1"],
                               NS=st["NS"])
        k3 = functools.partial(ws.k3_fix2, C0=st["C0"], C1=st["C1"],
                               NS=st["NS"])
    else:
        k1, k3 = ws.k1_scan, ws.k3_fix

    steps_w = -(-p["steps_p"] // 32)

    def upto_k3_parts(w2, tabw, lim2):
        bits3 = ws.words_matrix_device(w2, steps_w)
        sym, val, cntmap, exmap, mrowmap = k1(bits3, tabw, lim2, **kw)
        HP = cntmap.shape[0]

        def to_k2(m):
            m2 = (m.reshape(HP, G).T.reshape(p["NG"], p["Rg"], HP)
                  .transpose(1, 0, 2))
            return jnp.pad(m2, ((0, 0), (0, 0), (0, 128 - HP)))

        ent3, _ = ws.k2_compose(to_k2(exmap), jnp.zeros((1, 1), jnp.int32),
                                Rg=p["Rg"], NG=p["NG"], interpret=interp)
        entry = ent3[:, :, 0].T.reshape(G).astype(jnp.int32)
        mrow_sel = ws._select_h(mrowmap.reshape(HP, G), entry, H)
        cut = jnp.where(entry == 0, 0, mrow_sel + 1)
        cut = jnp.where(lim2.reshape(G) > 0, cut, 0)
        cut_slot = jnp.where(cut > 0, (cut - 1) // md + 1, 0)
        msym, mval = k3(bits3, tabw, entry.reshape(R, 128),
                        cut.reshape(R, 128), cut_slot.reshape(R, 128),
                        sym, val, G=G, steps_p=p["steps_p"], SEG=p["SEG"],
                        UNROLL=p["UNROLL"], md=md, RB=p["RB"],
                        interpret=interp)
        return sym, val, cntmap, entry, msym, mval

    @jax.jit
    def upto_k1(w2, tabw, lim2):
        bits3 = ws.words_matrix_device(w2, steps_w)
        sym, val, cntmap, *_ = k1(bits3, tabw, lim2, **kw)
        return cntmap[0, 0, 0] + sym[0, 0, 0].astype(jnp.int32)

    @jax.jit
    def upto_k2(w2, tabw, lim2):
        bits3 = ws.words_matrix_device(w2, steps_w)
        sym, val, cntmap, exmap, mrowmap = k1(bits3, tabw, lim2, **kw)
        HP = cntmap.shape[0]
        m2 = (exmap.reshape(HP, G).T.reshape(p["NG"], p["Rg"], HP)
              .transpose(1, 0, 2))
        ent3, _ = ws.k2_compose(jnp.pad(m2, ((0, 0), (0, 0), (0, 128 - HP))),
                                jnp.zeros((1, 1), jnp.int32),
                                Rg=p["Rg"], NG=p["NG"], interpret=interp)
        return ent3[0, 0, 0] + sym[0, 0, 0].astype(jnp.int32)

    @jax.jit
    def upto_k3(w2, tabw, lim2):
        *_, msym, mval = upto_k3_parts(w2, tabw, lim2)
        return msym[0, 0, 0] + mval[0, 0, 0].astype(jnp.int32)

    @jax.jit
    def full(w2, tabw, lim2):
        return ws.wide_decode_program(
            w2, tabw, lim2, Rg=p["Rg"], NG=p["NG"], ORP=p["ORP"],
            C0=st["C0"], C1=st["C1"], NS=st["NS"], chunk2=st["chunk2"],
            **kw)[3]

    b3, tw, l2 = st["words"], st["tabw"], st["lim2"]

    # device-protocol timing: the relay's fixed round-trip floor would
    # otherwise swamp millisecond stages, so amortize K dispatches per
    # fence and subtract the measured floor (cf. bench.py)
    fj = jax.jit(lambda x: x + 1)
    xj = jnp.zeros(8, jnp.int32)
    _fence(fj(xj))
    floors = []
    for _ in range(8):
        t0 = time.perf_counter()
        _fence(fj(xj))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)

    def timed(fn):
        out = fn(b3, tw, l2)
        _fence(out)
        K = 10
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(K):
                out = fn(b3, tw, l2)
            _fence(out)
            dt = (time.perf_counter() - t0 - floor) / K
            best = dt if best is None else min(best, dt)
        return max(best, 0.0)

    ts = {}
    for key, fn in (("k1_scan_discovery", upto_k1), ("k2_compose", upto_k2),
                    ("k3_fix_splice", upto_k3), ("k4_compact", full)):
        ts[key] = timed(fn)
    # nested prefixes -> per-stage deltas
    report = {"k1_scan_discovery": ts["k1_scan_discovery"]}
    report["k2_compose"] = max(ts["k2_compose"] - ts["k1_scan_discovery"], 0.0)
    report["k3_fix_splice"] = max(ts["k3_fix_splice"] - ts["k2_compose"], 0.0)
    report["k4_compact"] = max(ts["k4_compact"] - ts["k3_fix_splice"], 0.0)
    report["total"] = ts["k4_compact"]
    return report


@contextlib.contextmanager
def trace(log_dir: str):
    """`jax.profiler` trace context for full XLA timelines (view with
    tensorboard or xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def format_report(report: dict[str, float]) -> str:
    width = max(len(k) for k in report)
    lines = [f"{k:>{width}}  {v * 1e3:10.3f} ms" for k, v in report.items()]
    return "\n".join(lines)
