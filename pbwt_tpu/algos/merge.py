"""Multi-PBWT merge (pbwtMerge.c): synced positional walk over k pbwts,
keeping only sites present in every file, concatenating haplotype columns
and re-PBWTing the union panel."""

from __future__ import annotations

import numpy as np

from ..core import engine, registry
from ..core.pbwt import PBWT, Site
from ..io import pbwtfile
from ..utils import log


def merge(filenames: list[str]) -> PBWT:
    pbwts: list[PBWT] = []
    for fn in filenames:
        with open(fn, "rb") as fp:
            p = pbwtfile.read_pbwt(fp)
        sites_fn = fn[:-4] + "sites" if fn.endswith("pbwt") else fn + ".sites"
        with open(sites_fn) as fp:
            pbwtfile.read_sites(p, fp)
        pbwts.append(p)
    for p in pbwts[1:]:
        if p.chrom != pbwts[0].chrom:
            raise ValueError(f"Different chromosomes: {pbwts[0].chrom} vs {p.chrom}")

    vd = registry.variation_dict
    Xs = [p.haplotypes() for p in pbwts]
    keys = [[(s.x, vd.name(s.varD)) for s in p.sites] for p in pbwts]
    ptr = [0] * len(pbwts)
    nhaps = sum(p.M for p in pbwts)

    out = PBWT(nhaps, 0)
    out.sites = []
    out.chrom = pbwts[0].chrom
    u = engine.WriteCursor(nhaps)

    while all(ptr[i] < len(keys[i]) for i in range(len(pbwts))):
        key = min(keys[i][ptr[i]] for i in range(len(pbwts)))
        if all(keys[i][ptr[i]] == key for i in range(len(pbwts))):
            yseq = np.concatenate([Xs[i][:, ptr[i]] for i in range(len(pbwts))])
            u.write_natural(yseq)
            out.sites.append(Site(x=key[0], varD=vd.add(key[1])))
            out.N += 1
            for i in range(len(pbwts)):
                ptr[i] += 1
        else:
            for i in range(len(pbwts)):
                if keys[i][ptr[i]] == key:
                    ptr[i] += 1

    out.yz = u.packed()
    out.aFend = u.a.copy()
    log(f"merged {len(pbwts)} pbwts: M, N are {out.M}, {out.N}")
    return out
