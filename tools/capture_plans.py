"""Dump ``.explain('formatted')`` for registry queries to
``plans/r15/<query>_<tag>.txt`` (the optimization-round evidence
files).

Usage:
    python tools/capture_plans.py <tag> [sf_dir] <query> [query ...]

Streaming fixture queries EXECUTE on construction (the registry
callable drains a real StreamingQuery and returns a batch frame over
its output); their formatted plan is the post-drain read, so for
those the interesting before/after evidence is the phase/batch
profile recorded in OPTIMIZATION_r14.md — the plan file still pins
the returned frame's shape.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from contextlib import redirect_stdout


def main() -> None:
    tag = sys.argv[1]
    rest = sys.argv[2:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    import __spark_entry__ as entry_mod
    from tablite_spark import get_spark
    spark = get_spark("capture_plans")
    qs = entry_mod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') @ {sf_dir} "
                     f"[{tag}]\n")
            fh.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
