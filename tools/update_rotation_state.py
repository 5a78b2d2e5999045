"""Regenerate tools/rotation_state.json from the CORRECTNESS_r*.json
artifacts at the repo root.

The query registry orders oracle-backed queries least-previously-
driver-sampled first so every round's time-capped correctness run
verifies new names.  Those sample counts used to be inferred at import
time by globbing CORRECTNESS_r*.json — which made iteration order
depend on which artifacts happen to exist in a checkout.  This tool
materializes the counts into a COMMITTED file instead; run it once per
round after the driver drops a new CORRECTNESS_r{N}.json:

    python tools/update_rotation_state.py
"""
import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tools", "rotation_state.json")


def main() -> None:
    counts: dict[str, int] = {}
    sources: list[str] = []
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                payload = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(payload, dict):
            sources.append(os.path.basename(path))
            for name in payload:
                counts[name] = counts.get(name, 0) + 1
    with open(OUT, "w") as fh:
        json.dump(
            {"source_artifacts": sources, "counts": dict(sorted(counts.items()))},
            fh,
            indent=1,
        )
        fh.write("\n")
    print(f"{OUT}: {len(counts)} names from {len(sources)} artifacts")


if __name__ == "__main__":
    main()
