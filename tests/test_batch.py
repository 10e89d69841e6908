"""Batched multi-stream decode (ops/pallas_batch), interpreter mode.

N independent streams — different trees, alphabets, min-depths and
sizes — through ONE widescan program; every stream's bytes must match
its individual decode exactly.  The batch amortizes the per-program
dispatch floor the round-4 measurements pinned (DESIGN.md); the
reference's analog is the back-to-back small-corpus suite loop
(mainrun.c:541-588), which pays a full launch sequence per corpus.
"""

import numpy as np
import pytest

from huffmandecoderongpus_tpu.huffio.encoder import encode_bytes
from huffmandecoderongpus_tpu.ops import pallas_batch as pb
from huffmandecoderongpus_tpu.ops import pallas_widescan as ws


def _text_like(rng, n, alphabet=8, skew=3.0):
    # weight ratio bounded (max/min <= skew+1): no symbol's frequency can
    # reach the ~0.4 that would give it a 1-bit code — the batch path
    # requires md >= 2, and unbounded power-law draws made the trees
    # depend on rng state
    w = rng.random(alphabet) * skew + 1.0
    raw = rng.choice(np.arange(alphabet, dtype=np.uint8), size=n,
                     p=w / w.sum()).astype(np.uint8)
    return raw


@pytest.mark.interpret
def test_batch_two_streams_distinct_trees():
    rng = np.random.default_rng(11)
    # two streams with different alphabets/trees in one program
    # (~40s: one batched-program compile; nightly with the other
    # kernel-compile-heavy cases)
    raw1 = _text_like(rng, 9000, alphabet=8)
    raw2 = _text_like(rng, 12000, alphabet=16, skew=2.0)
    hf1, hf2 = encode_bytes(raw1), encode_bytes(raw2)
    outs = pb.decode_widescan_batch([hf1, hf2], interpret=True)
    np.testing.assert_array_equal(outs[0], raw1)
    np.testing.assert_array_equal(outs[1], raw2)


@pytest.mark.interpret
def test_batch_mixed_md_and_sizes():
    rng = np.random.default_rng(12)
    # mixed min-depths (md 2 and 3): the batch runs at md_c = min and
    # the higher-md stream's emissions split across odd slot boundaries;
    # plus a tiny (single-live-lane) stream in the same program
    raw1 = _text_like(rng, 30000, alphabet=8)       # md ~2
    raw2 = _text_like(rng, 20000, alphabet=64, skew=1.0)  # deeper, md >= 3
    raw3 = np.tile(np.arange(8, dtype=np.uint8), 5)  # uniform: md=3, tiny
    hfs = [encode_bytes(r) for r in (raw1, raw2, raw3)]
    mds = sorted({max(pb.build_lane_dfa(h.tree).min_depth, 1) for h in hfs})
    assert len(mds) > 1  # genuinely mixed min-depths
    outs = pb.decode_widescan_batch(hfs, interpret=True)
    for out, raw in zip(outs, (raw1, raw2, raw3)):
        np.testing.assert_array_equal(out, raw)


def test_batch_rejects_md1():
    rng = np.random.default_rng(13)
    raw1 = _text_like(rng, 9000, alphabet=8)
    raw2 = (rng.random(9000) < 0.3).astype(np.uint8)  # md=1 tree
    with pytest.raises(ws.EnvelopeError):
        pb.stage_batch_inputs([encode_bytes(raw1), encode_bytes(raw2)])


@pytest.mark.interpret
def test_batch_overflow_member_falls_back(monkeypatch):
    # ~2 min: three program compiles (batch + two individual fallbacks)
    rng = np.random.default_rng(14)
    # streams overflowing the shared dense buffer re-decode individually
    # (decode_widescan's own fallback chain) without failing the batch.
    # ORP is 128-granular, so overflow needs > 128 symbols in a lane:
    # force B=512 (~190 symbols/lane) and clamp ORP to one window.
    raw1 = _text_like(rng, 9000, alphabet=8)
    raw2 = _text_like(rng, 9000, alphabet=8, skew=2.0)
    hfs = [encode_bytes(raw1), encode_bytes(raw2)]
    real_stage = pb.stage_batch_inputs

    def clamped(hfs_, B=None):
        st = real_stage(hfs_, B=B)
        assert max(-(-h.bits // st["plan"]["B"]) for h in hfs_) >= 1
        st["plan"]["ORP"] = 128
        return st

    monkeypatch.setattr(pb, "stage_batch_inputs", clamped)
    outs = pb.decode_widescan_batch(hfs, B=512, interpret=True)
    np.testing.assert_array_equal(outs[0], raw1)
    np.testing.assert_array_equal(outs[1], raw2)


@pytest.mark.slow
def test_batch_bigtable_corpora():
    """The reference's bigtable small corpora (paper1+news+book2,
    mainrun.c:541-588) through ONE batched program, bit-exact
    (auto_split=False: this pins the one-program path on real corpora;
    the default policy would solo the multi-Mbit members)."""
    from huffmandecoderongpus_tpu import data as corpus

    tds = [corpus.load_test_data(n) for n in ("paper1", "news", "book2")]
    outs = pb.decode_widescan_batch([td.cd for td in tds], interpret=True,
                                    auto_split=False)
    for out, td in zip(outs, tds):
        np.testing.assert_array_equal(out, td.ucd)


@pytest.mark.interpret
def test_batch_fuzz_random_batches():
    # property fuzz over batch shapes: random member counts, alphabets
    # and sizes (incl. sub-lane tiny streams) through one program each
    rng = np.random.default_rng(99)
    for trial in range(3):
        n_streams = int(rng.integers(2, 5))
        raws, hfs = [], []
        for _ in range(n_streams):
            alpha = int(rng.choice([4, 8, 16, 32]))
            size = int(rng.integers(50, 15000))
            raw = _text_like(rng, size, alphabet=alpha,
                             skew=float(rng.uniform(0.5, 3.0)))
            raws.append(raw)
            hfs.append(encode_bytes(raw))
        try:
            outs = pb.decode_widescan_batch(hfs, interpret=True,
                                            auto_split=False)
        except ws.EnvelopeError:
            continue  # an md=1 draw; the envelope check is its own test
        for out, raw in zip(outs, raws):
            np.testing.assert_array_equal(out, raw)


def _fake_solo_recorder(calls):
    def fake_solo(hf, check_size=True, interpret=False):
        calls.append(hf.bits)
        from huffmandecoderongpus_tpu.native import simple_decode
        return simple_decode(hf)
    return fake_solo


def test_batch_auto_split_all_solo(monkeypatch):
    # fewer than two floor-bound members -> no batch program at all;
    # every stream decodes through its routed solo path (cheap: no
    # kernel compile, the solo path is stubbed with the native oracle)
    rng = np.random.default_rng(15)
    raws = [_text_like(rng, n, alphabet=8) for n in (4000, 8000, 16000)]
    hfs = [encode_bytes(r) for r in raws]
    assert hfs[0].bits < hfs[1].bits < hfs[2].bits
    calls = []
    import huffmandecoderongpus_tpu.ops.pallas_widescan as ws_mod

    monkeypatch.setattr(ws_mod, "decode_widescan", _fake_solo_recorder(calls))
    monkeypatch.setattr(pb, "BATCH_SOLO_BITS", hfs[1].bits)
    outs = pb.decode_widescan_batch(hfs, interpret=True)
    assert sorted(calls) == sorted(h.bits for h in hfs)
    for out, raw in zip(outs, raws):
        np.testing.assert_array_equal(out, raw)


@pytest.mark.interpret
def test_batch_auto_split_mixed(monkeypatch):
    # the measured decision rule as API behavior: the member at or above
    # BATCH_SOLO_BITS decodes through its routed solo path while the two
    # small ones share one batched program
    rng = np.random.default_rng(15)
    raws = [_text_like(rng, n, alphabet=8) for n in (4000, 8000, 16000)]
    hfs = [encode_bytes(r) for r in raws]
    assert hfs[0].bits < hfs[1].bits < hfs[2].bits
    calls = []
    import huffmandecoderongpus_tpu.ops.pallas_widescan as ws_mod

    monkeypatch.setattr(ws_mod, "decode_widescan", _fake_solo_recorder(calls))
    monkeypatch.setattr(pb, "BATCH_SOLO_BITS", hfs[2].bits)
    outs = pb.decode_widescan_batch(hfs, interpret=True)
    assert calls == [hfs[2].bits]
    for out, raw in zip(outs, raws):
        np.testing.assert_array_equal(out, raw)
