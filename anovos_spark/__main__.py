"""CLI entry: ``python -m anovos_spark config.yaml [master]``.

Mirrors the reference's batch CLI contract (``main.py config.yaml
run_type`` → workflow.run; reference src/main/anovos/__main__.py:1-4,
workflow.py:873-889) on this engine's YAML schema
(plans/pipeline.py:run_pipeline).  The optional second argument is the
Spark master (default local[*]); stage timings print to stdout and the
final frame's row count is the exit summary.
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print("usage: python -m anovos_spark <config.yaml> [master]", file=sys.stderr)
        return 2
    config_path = argv[1]
    master = argv[2] if len(argv) > 2 else "local[*]"

    from anovos_spark.core.session import get_session
    from anovos_spark.plans.pipeline import run_pipeline

    spark = get_session(master=master)
    try:
        result = run_pipeline(spark, config_path)
        for stage, sec in result.timings.items():
            print(f"{stage:32s} {sec:8.3f}s")
        n = result.df.count() if result.df is not None else 0
        print(f"done: {n} rows in final frame")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
