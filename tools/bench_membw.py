"""Single-box scaling ceiling for the Python page work (evidence tool).

The two-cluster-size protocol runs both "cluster sizes" on ONE machine
(local[8] vs local[32]). On one box all 32 workers share the same DRAM
controllers, so allocation-/string-heavy Python (page synthesis, text
extraction) hits a memory-bandwidth ceiling long before 4x: this tool
measures that ceiling directly — N worker processes each doing the
SAME per-process amount of page work; ideal hardware would show equal
walls at 8 and 32 processes.

The number this prints is the upper bound ANY Spark job whose hot loop
is this Python work can reach on this box from local[8] -> local[32].
On a real 4N-executor cluster each executor brings its own memory
bandwidth, so this ceiling is a single-box artifact, not a property of
the crawl design (whose per-round work is map-only O(batch) with no
term that grows with cluster size).

Usage: python tools/bench_membw.py [pages_per_proc]  -> one JSON line
(default 1200 is a ~1 s burst; pass 8000+ for the SUSTAINED ceiling —
burst runs overstate the ceiling because turbo/quiet-neighbor windows
last longer than the probe)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import random
import sys
import time

sys.path.insert(0, "/root/repo")

from pygeodatacrawler_spark.fixtures import _page_row  # noqa: E402
from pygeodatacrawler_spark.functions.text import (  # noqa: E402
    extract_links_py,
    extract_text_py,
)

HOSTS = [f"www.host-{i:03d}.org" for i in range(60)]
SIZES = [180000] + [7118] * 59
PAGES_PER_PROC = 1200  # overridden by argv[1]


def _build(gid: int) -> bytes:
    rng = random.Random((42 << 20) ^ gid)
    return _page_row(0, gid % 1000, HOSTS, SIZES, rng, 1500, 3500)["html"]


_HTMLS = None


def _init():
    global _HTMLS
    _HTMLS = [_build(i) for i in range(300)]


def w_synth(args) -> int:
    base, n = args
    s = 0
    for gid in range(base, base + n):
        rng = random.Random((42 << 20) ^ gid)
        s += len(_page_row(0, gid % 1000, HOSTS, SIZES, rng, 1500, 3500)["html"])
    return s


def w_extract(args) -> int:
    _, n = args
    s = 0
    for i in range(n):
        h = _HTMLS[i % 300]
        s += len(extract_text_py(h)) + len(extract_links_py(h, "u"))
    return s


def bench(fn, nproc: int, per_proc: int) -> float:
    with mp.Pool(nproc, initializer=_init) as p:
        t0 = time.monotonic()
        p.map(fn, [(i * per_proc, per_proc) for i in range(nproc)])
        return time.monotonic() - t0


def main() -> None:
    per_proc = int(sys.argv[1]) if len(sys.argv) > 1 else PAGES_PER_PROC
    out = {"pages_per_proc": per_proc}
    for name, fn in [("synthesize", w_synth), ("extract", w_extract)]:
        w8, w32 = bench(fn, 8, per_proc), bench(fn, 32, per_proc)
        out[name] = {
            "wall_8proc_s": round(w8, 2),
            "wall_32proc_s": round(w32, 2),
            # equal per-process work: ideal box would give ratio 1.0;
            # the 8->32 efficiency ceiling for fixed total work is w8/w32
            "scaling_ceiling": round(w8 / w32, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
