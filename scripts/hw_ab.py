"""Same-process A/B of two pallas_widescan versions on one corpus.

Loads a second pallas_widescan from a file path under a different module
name, stages/compiles both programs, then interleaves differenced timing
batches — the only protocol that survives this relay's session drift.

Usage: python scripts/hw_ab.py <other_widescan.py> [corpus] [lanesA] [lanesB]
(lanesA applies to the CURRENT module, lanesB to the other; 0 = plan)
"""
import importlib.util
import sys
import time

import numpy as np


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def make_runner(ws, hf, lanes):
    st = ws.stage_widescan_inputs(hf, lanes=(lanes or None))
    p = st["plan"]

    def run():
        return ws.wide_decode_program(
            st["words"], st["tabw"], st["lim2"], B=p["B"], H=st["H"],
            G=p["G"], steps=p["steps"], steps_p=p["steps_p"], SEG=p["SEG"],
            UNROLL=p["UNROLL"], md=st["md"], Rg=p["Rg"], NG=p["NG"],
            ORP=p["ORP"], RB=p["RB"], C0=st["C0"], C1=st["C1"],
            NS=st["NS"], chunk2=st["chunk2"])

    return run, st, p


def main():
    other = sys.argv[1]
    corpus = sys.argv[2] if len(sys.argv) > 2 else "kjv.txt"
    lanesA = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    lanesB = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws_new

    ws_old = load_module(other, "ws_other")
    td = data.load_test_data(corpus)
    hf = td.cd
    runs = {}
    for tag, ws, lanes in (("A:current", ws_new, lanesA),
                           ("B:other  ", ws_old, lanesB)):
        run, st, p = make_runner(ws, hf, lanes)
        denseT, n, total, fence = run()
        np.asarray(fence)
        counts = np.asarray(n)
        mask = np.arange(p["ORP"])[None, :] < counts[:, None]
        out = np.asarray(denseT)[mask]
        ok = out.size == td.ucd.size and np.array_equal(out, td.ucd)
        print(f"{tag} G={p['G']} ORP={p['ORP']} exact={ok}", flush=True)
        runs[tag] = run

    KA, KB = 10, 30
    la = {t: [] for t in runs}
    lb = {t: [] for t in runs}
    for trial in range(7):
        for t, run in runs.items():
            t0 = time.perf_counter()
            for _ in range(KA):
                o = run()
            np.asarray(o[3]).reshape(-1)[:1]
            la[t].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            for _ in range(KB):
                o = run()
            np.asarray(o[3]).reshape(-1)[:1]
            lb[t].append(time.perf_counter() - t0)
    for t in runs:
        dt = (min(lb[t]) - min(la[t])) / (KB - KA)
        gbps = hf.uncompressed_size / dt / 1e9
        print(f"{t}: {dt*1e3:7.3f} ms  {gbps:5.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
