"""Robust kjv-class timing: high-K two-batch differencing.

Per-run time = (T(KB) - T(KA)) / (KB - KA) over min-of-trials batches —
the relay's per-fence round-trip (23-36 ms spread) cancels, and the
residual error is ~rt_spread / (KB - KA).

Usage: python scripts/hw_robust.py [corpus] [KA] [KB] [trials]
"""
import sys
import time

import numpy as np


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "kjv.txt"
    KA = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    KB = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    td = data.load_test_data(corpus)
    hf = td.cd
    st = ws.stage_widescan_inputs(hf)
    p = st["plan"]

    def run():
        return ws.wide_decode_program(
            st["words"], st["tabw"], st["lim2"], B=p["B"], H=st["H"],
            G=p["G"], steps=p["steps"], steps_p=p["steps_p"], SEG=p["SEG"],
            UNROLL=p["UNROLL"], md=st["md"], Rg=p["Rg"], NG=p["NG"],
            ORP=p["ORP"], RB=p["RB"], C0=st["C0"], C1=st["C1"],
            NS=st["NS"], chunk2=st["chunk2"])

    denseT, n, total, fence = run()
    np.asarray(fence)
    counts = np.asarray(n)
    mask = np.arange(p["ORP"])[None, :] < counts[:, None]
    out = np.asarray(denseT)[mask]
    ok = out.size == td.ucd.size and np.array_equal(out, td.ucd)

    def batch(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = run()
        np.asarray(o[3]).reshape(-1)[:1]
        return time.perf_counter() - t0

    batch(KA)  # warm
    la = [batch(KA) for _ in range(trials)]
    lb = [batch(KB) for _ in range(trials)]
    t = (min(lb) - min(la)) / (KB - KA)
    gbps = hf.uncompressed_size / t / 1e9
    print(f"{corpus} exact={ok} t={t*1e3:.3f} ms {gbps:.2f} GB/s "
          f"(KA={KA} minA={min(la)*1e3:.1f} KB={KB} minB={min(lb)*1e3:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
