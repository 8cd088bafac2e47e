"""Config-5 head-to-head: -paintSparse, reference binary vs pbwt-tpu.

Builds the same synthetic mosaic panel as scripts/scale_check.py, writes it
as a .pbwt root both implementations can read, then times

    pbwt -readAll panel -paintSparse out 100 2 0.0

for (a) the reference binary compiled from /root/reference (htslib stubbed;
paintSparse needs no VCF) and (b) this framework's host path.  Reports wall
time and peak RSS for each; run on an otherwise idle box.

Usage: python scripts/paint_headtohead.py [M] [N] [--skip-ours|--skip-ref]
"""

import glob
import os
import resource
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HTSLIB_STUB = """
#include "utils.h"
#include "pbwt.h"
const char *pbwtHtslibVersionString(void) { return "stub"; }
PBWT *pbwtReadVcfGT (char *filename) { die("no htslib") ; return 0 ; }
PBWT *pbwtReadVcfPL (char *filename) { die("no htslib") ; return 0 ; }
void pbwtWriteVcf (PBWT *p, char *f, char *r, char *m) { die("no htslib") ; }
"""


def build_ref(workdir):
    d = os.path.join(workdir, "refbuild")
    os.makedirs(d, exist_ok=True)
    for f in glob.glob("/root/reference/*.c") + glob.glob("/root/reference/*.h"):
        shutil.copy(f, d)
    open(os.path.join(d, "version.h"), "w").write(
        '#define PBWT_COMMIT_HASH ""\n')
    open(os.path.join(d, "pbwtHtslib_stub.c"), "w").write(HTSLIB_STUB)
    srcs = [s for s in os.listdir(d)
            if s.endswith(".c") and s != "pbwtHtslib.c"]
    out = os.path.join(d, "pbwt_ref")
    subprocess.run(["gcc", "-O2", "-w", "-o", out]
                   + [os.path.join(d, s) for s in srcs] + ["-lm", "-lz"],
                   check=True)
    return out


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    skip_ours = "--skip-ours" in sys.argv
    skip_ref = "--skip-ref" in sys.argv

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from scale_check import build_panel

    from pbwt_tpu.io import pbwtfile

    workdir = tempfile.mkdtemp(prefix="paint_h2h_")
    print(f"workdir {workdir}", flush=True)

    t0 = time.perf_counter()
    p = build_panel(M, N)
    root = os.path.join(workdir, "panel")
    pbwtfile.write_all(p, root)
    print(f"panel M={M} N={N}: built+written in "
          f"{time.perf_counter() - t0:.1f}s "
          f"({os.path.getsize(root + '.pbwt') / 1e6:.1f} MB .pbwt)",
          flush=True)

    results = {}
    if not skip_ref:
        ref = build_ref(workdir)
        outroot = os.path.join(workdir, "ref_out")
        t0 = time.perf_counter()
        res = subprocess.run(
            [ref, "-readAll", root, "-paintSparse", outroot, "100", "2",
             "0.0"], capture_output=True)
        dt = time.perf_counter() - t0
        if res.returncode != 0:
            print(f"REF FAILED rc={res.returncode}: {res.stderr[-400:]}",
                  flush=True)
        else:
            sz = sum(os.path.getsize(f)
                     for f in glob.glob(outroot + "*")) / 1e6
            results["reference"] = dt
            print(f"reference -paintSparse: {dt:.1f}s ({dt / 60:.1f} min), "
                  f"{sz:.0f} MB output", flush=True)
        for f in glob.glob(outroot + "*"):
            os.unlink(f)

    if not skip_ours:
        cli = [sys.executable, "-m", "pbwt_tpu", "-readAll", root,
               "-paintSparse", os.path.join(workdir, "our_out"), "100", "2",
               "0.0"]
        env = dict(os.environ, PYTHONPATH=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            PBWT_TPU_DEVICE="0")
        t0 = time.perf_counter()
        res = subprocess.run(cli, capture_output=True, env=env)
        dt = time.perf_counter() - t0
        if res.returncode != 0:
            print(f"OURS FAILED rc={res.returncode}: {res.stderr[-400:]}",
                  flush=True)
        else:
            sz = sum(os.path.getsize(f) for f in
                     glob.glob(os.path.join(workdir, "our_out*"))) / 1e6
            results["pbwt-tpu"] = dt
            kid = resource.getrusage(resource.RUSAGE_CHILDREN)
            print(f"pbwt-tpu -paintSparse: {dt:.1f}s ({dt / 60:.1f} min), "
                  f"{sz:.0f} MB output, child peak RSS "
                  f"{kid.ru_maxrss / 1e6:.1f} GB (max over ref+ours when "
                  f"both ran)", flush=True)

    if len(results) == 2:
        r, o = results["reference"], results["pbwt-tpu"]
        print(f"head-to-head: reference {r / 60:.1f} min vs pbwt-tpu "
              f"{o / 60:.1f} min ({r / o:.2f}x)", flush=True)
    print(f"peak RSS this process (panel build only): "
          f"{resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6:.1f} GB",
          flush=True)
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
