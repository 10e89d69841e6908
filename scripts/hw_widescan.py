"""HW validation + timing of the widescan kernels, stage by stage.

Usage: python scripts/hw_widescan.py [corpus] [lanes]
Prints per-stage compile status, bit-exactness, and amortized timings.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def floor_s(reps=10):
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8, jnp.int32)
    np.asarray(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit(fn, fence, floor, K=10, trials=5):
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn()
        np.asarray(fence(out)).reshape(-1)[:1]
        ts.append((time.perf_counter() - t0 - floor) / K)
    return min(ts), out


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "news"
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws
    from huffmandecoderongpus_tpu.ops.lanedfa import build_lane_dfa

    td = data.load_test_data(corpus)
    hf = td.cd
    dfa = build_lane_dfa(hf.tree)
    H = max(dfa.height, 1)
    md = max(dfa.min_depth, 1)
    avg = hf.bits / max(hf.uncompressed_size, 1)
    p = ws._plan(hf.bits, H, md, lanes=(lanes or None), avg_len=avg)
    print(f"{corpus}: bits={hf.bits} H={H} md={md} plan={p}", flush=True)
    G = p["G"]
    R = G // 128
    st = ws.stage_widescan_inputs(hf, lanes=(lanes or None))
    chunk2, C0, C1, NS = st["chunk2"], st["C0"], st["C1"], st["NS"]
    tabw = st["tabw"]
    w2, lim2 = st["words"], st["lim2"]
    fl = floor_s()
    print(f"floor {fl*1e3:.1f} ms", flush=True)
    kw = dict(B=p["B"], H=H, G=G, steps=p["steps"], steps_p=p["steps_p"],
              SEG=p["SEG"], UNROLL=p["UNROLL"], md=md, RB=p["RB"])
    kw1 = dict(kw, C0=C0, C1=C1, NS=NS) if chunk2 else kw
    k1raw = ws.k1_scan2 if chunk2 else ws.k1_scan
    steps_w = -(-p["steps_p"] // 32)

    @jax.jit
    def k1(w2, tabw, lim2):
        wmat = ws.words_matrix_device(w2, steps_w)
        return k1raw(wmat, tabw, lim2, **kw1)

    # --- stage 1: K1 alone --------------------------------------------------
    try:
        t0 = time.perf_counter()
        outs = k1(w2, tabw, lim2)
        np.asarray(outs[2]).reshape(-1)[:1]
        print(f"K1 compile+run ok ({time.perf_counter()-t0:.1f}s)", flush=True)
        t, _ = timeit(lambda: k1(w2, tabw, lim2),
                      lambda o: o[2], fl)
        print(f"K1: {t*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"K1 FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return

    # --- stage 2: full program ---------------------------------------------
    try:
        t0 = time.perf_counter()
        run = lambda: ws.wide_decode_program(
            w2, tabw, lim2, Rg=p["Rg"], NG=p["NG"], ORP=p["ORP"],
            C0=C0, C1=C1, NS=NS, chunk2=chunk2, **kw)
        denseT, n, total, fence = run()
        np.asarray(fence)
        print(f"program compile+run ok ({time.perf_counter()-t0:.1f}s) "
              f"total={int(total)} want={hf.uncompressed_size}", flush=True)
        dense = np.asarray(denseT)
        counts = np.asarray(n)
        mask = np.arange(p["ORP"])[None, :] < counts[:, None]
        out = dense[mask]
        ok = (out.size == td.ucd.size and np.array_equal(out, td.ucd))
        print(f"bit-exact: {ok} (got {out.size} want {td.ucd.size})",
              flush=True)
        if not ok and out.size == td.ucd.size:
            d = np.nonzero(out != td.ucd)[0][:10]
            print(f"first diffs at {d}", flush=True)
        t, _ = timeit(run, lambda o: o[3], fl)
        gbps = hf.uncompressed_size / t / 1e9
        print(f"program: {t*1e3:.3f} ms  -> {gbps:.3f} GB/s", flush=True)
    except Exception as e:
        print(f"program FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
