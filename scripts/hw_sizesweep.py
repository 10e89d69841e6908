"""graph2-style input-size scaling sweep of the fused device decoder
(the reference's headline plot, mainrun.c:387-410): decode time vs input
size on symbol-boundary-truncated kjv instances.

Times the wide device program (staging words + tables pre-built per
size, as the reference reuses buffers), two-batch differenced.

Usage: python scripts/hw_sizesweep.py [corpus] [n_points]
"""
import sys
import time

import numpy as np


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "kjv.txt"
    npts = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.harness.truncate import truncate_test_data
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    td = data.load_test_data(corpus)
    full_bits = td.cd.bits
    sizes = [full_bits >> k for k in range(npts - 1, 0, -1)] + [full_bits]
    print(f"{corpus}: {full_bits} bits, points={len(sizes)}", flush=True)
    print(f"{'bits':>10s} {'bytes':>9s} {'ms':>8s} {'GB/s':>6s} exact",
          flush=True)
    for tb in sizes:
        rtd = truncate_test_data(td, tb) if tb < full_bits else td
        hf = rtd.cd
        try:
            st = ws.stage_widescan_inputs(hf)
        except ws.EnvelopeError:
            print(f"{tb:10d} (below envelope)", flush=True)
            continue
        p = st["plan"]

        def run():
            return ws.wide_decode_program(
                st["words"], st["tabw"], st["lim2"], B=p["B"], H=st["H"],
                G=p["G"], steps=p["steps"], steps_p=p["steps_p"],
                SEG=p["SEG"], UNROLL=p["UNROLL"], md=st["md"], Rg=p["Rg"],
                NG=p["NG"], ORP=p["ORP"], RB=p["RB"], C0=st["C0"],
                C1=st["C1"], NS=st["NS"], chunk2=st["chunk2"])

        denseT, n, total, fence = run()
        np.asarray(fence)
        counts = np.asarray(n)
        mask = np.arange(p["ORP"])[None, :] < counts[:, None]
        out = np.asarray(denseT)[mask]
        ok = (out.size == rtd.ucd.size
              and np.array_equal(out, np.asarray(rtd.ucd)))

        def batch(k):
            t0 = time.perf_counter()
            for _ in range(k):
                o = run()
            np.asarray(o[3]).reshape(-1)[:1]
            return time.perf_counter() - t0

        batch(5)
        la = min(batch(10) for _ in range(5))
        lb = min(batch(30) for _ in range(5))
        t = max(lb - la, 1e-9) / 20
        gbps = hf.uncompressed_size / t / 1e9
        print(f"{hf.bits:10d} {hf.uncompressed_size:9d} {t*1e3:8.3f} "
              f"{gbps:6.2f} {ok}", flush=True)


if __name__ == "__main__":
    main()
