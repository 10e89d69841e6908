"""Round-5 K4 denser-cell experiment: measure the per-probe cost directly.

The round-4 dead-end note said a further K4 win needs denser input cells
(8-slot cells halving cells_p).  The claimed win decomposes into (a) one
fewer binary-search probe and (b) halved valid-mask traffic; the cost is
~13 extra in-cell select ops per out-window tile (two-level popcount
select over 8 slots + the sym word parity pick).  This script measures
(a) EXACTLY: the same spliced kjv cell arrays through k4_compact at
probes = 7 (exact), 6 and 5 (timing-only truncated searches — wrong
bytes, identical op structure), same session, interleaved two-batch
differencing.  DESIGN.md's round-5 K4 note carries the verdict.

Usage: python scripts/hw_k4probes.py [corpus]
"""
import sys

import numpy as np

from _timing import timeit


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "kjv.txt"
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    td = data.load_test_data(corpus)
    hf = td.cd
    st = ws.stage_widescan_inputs(hf)
    p = st["plan"]
    cells_p = p["steps_p"] // st["md"] // ws.CELL
    print(f"{corpus}: G={p['G']} B={p['B']} cells_p={cells_p} "
          f"CW={-(-cells_p // 128)} ORP={p['ORP']}", flush=True)

    # produce the spliced cell arrays once (K1 only: the fix splice does
    # not change K4's timing shape) and keep them on device
    wmat = ws.words_matrix_device(st["words"], -(-p["steps_p"] // 32))
    sym, val, *_ = ws.k1_scan2(
        wmat, st["tabw"], st["lim2"], B=p["B"], H=st["H"], G=p["G"],
        steps=p["steps"], steps_p=p["steps_p"], SEG=p["SEG"],
        UNROLL=p["UNROLL"], md=st["md"], C0=st["C0"], C1=st["C1"],
        NS=st["NS"], RB=p["RB"])
    sym.block_until_ready()

    base = None
    for probes in (7, 6, 5):
        run = lambda pr=probes: ws.k4_compact(
            sym, val, G=p["G"], cells_p=cells_p, ORP=p["ORP"], probes=pr)
        t, _ = timeit(run, lambda o: o[0, 0])
        note = "exact" if probes == 7 else "TIMING-ONLY (truncated search)"
        line = f"k4 probes={probes}: {t*1e3:7.3f} ms  [{note}]"
        if base is None:
            base = t
        else:
            line += f"  delta vs 7: {(t-base)*1e3:+.3f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
