"""Driver-contract consistency: every oracle key maps to a query, the
registry iteration order puts oracle-backed entries first, and the
entry module exposes the three required callables."""

import importlib.util
import os


def _entry_module():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_oracles_subset_of_queries():
    mod = _entry_module()
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    # every registry entry is oracle-backed (0 rows-only since round 4)
    assert sorted(set(q) - set(o)) == []


def test_registry_order_oracles_first():
    mod = _entry_module()
    q, o = mod.queries(), mod.oracle_sql()
    names = list(q)
    seen_rows_only = False
    for n in names:
        if n not in o:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracle-backed {n!r} after a rows-only entry"


def test_oracle_sql_is_nonempty_ansi():
    mod = _entry_module()
    for name, sql in mod.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_registry_names_are_stable():
    """Registry names are the driver's correctness-sampling key: renaming
    a query resets its cumulative driver-verified coverage.  New names
    may be ADDED (append them to registry_names_pinned.txt in the same
    commit); existing names must never change or disappear (r5 pin,
    per VERDICT r4 #7)."""
    import os

    from anovos_spark import queries

    pin_path = os.path.join(os.path.dirname(__file__), "registry_names_pinned.txt")
    with open(pin_path) as f:
        pinned = {l.strip() for l in f if l.strip()}
    current = set(queries.registry().keys())
    missing = pinned - current
    assert not missing, (
        f"registry names removed/renamed (breaks driver coverage accretion): "
        f"{sorted(missing)}"
    )
    unpinned = current - pinned
    assert not unpinned, (
        f"new registry names not pinned — append to registry_names_pinned.txt: "
        f"{sorted(unpinned)}"
    )


def test_rotation_state_covers_all_correctness_artifacts():
    """tools/rotation_state.json must be regenerated whenever a new
    CORRECTNESS_r*.json is COMMITTED (ADVICE r8): stale state silently
    skews the never-sampled-first registry ordering for the next driver
    round.

    r9 postmortem (VERDICT r9 item #1): the driver drops its own
    CORRECTNESS_r{N}.json AFTER the builder's last commit, so comparing
    against everything on disk turned every round red by construction.
    The contract is therefore: committed state must cover every artifact
    tracked at HEAD; artifacts on disk but NOT tracked (post-HEAD driver
    drops) are tolerated with a warning — they get absorbed by the next
    round's update_rotation_state.py run."""
    import glob
    import json
    import subprocess
    import warnings

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_disk = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    }
    try:
        tracked = set(
            subprocess.run(
                ["git", "-C", root, "ls-files", "CORRECTNESS_r*.json"],
                capture_output=True, text=True, timeout=30, check=True,
            ).stdout.split()
        )
    except Exception:
        # no git in the environment: fall back to requiring the state to
        # be a subset of what exists (never reference a vanished artifact)
        tracked = None
    with open(os.path.join(root, "tools", "rotation_state.json")) as f:
        state = json.load(f)
    in_state = set(state.get("source_artifacts", []))
    if tracked is not None:
        missing = tracked - in_state
        assert not missing, (
            f"rotation_state.json is stale — committed artifacts not in "
            f"state: {sorted(missing)}; run tools/update_rotation_state.py"
        )
        untracked_newer = (on_disk - tracked) - in_state
        if untracked_newer:
            warnings.warn(
                "post-HEAD driver artifacts not yet in rotation_state.json "
                f"(absorb next round): {sorted(untracked_newer)}"
            )
    vanished = in_state - on_disk
    assert not vanished, (
        f"rotation_state.json references artifacts missing from disk: "
        f"{sorted(vanished)}"
    )
    # counts must be sane ints (bool-typed values are hand-edit artifacts)
    for k, v in state.get("counts", {}).items():
        assert isinstance(v, int) and not isinstance(v, bool), (k, v)


def test_evidence_artifact_counts_match_registry():
    """The pinned current-round bench/oracle artifacts must cover the FULL
    registry (r8 verdict: prose said 168 while the registry had 170).

    ADVICE r9: the old `n_b >= n_reg` gate let an UNDER-covering artifact
    pass silently forever (the exact 168 < 170 regression it was written
    for).  bench.py now records `n_registry` — the registry size at run
    time — inside the artifact, so coverage is checked against the
    artifact's own contemporaneous registry, immune to registry growth
    between the bench run and this test."""
    import glob
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    benches = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    if benches:
        with open(benches[-1]) as f:
            raw = json.load(f)
        bench = raw.get("parsed") or raw  # driver wraps bench stdout
        n_b = bench.get("n_queries")
        n_reg_at_run = bench.get("n_registry")
        if n_b is not None and n_reg_at_run is not None:
            assert n_b == n_reg_at_run, (benches[-1], n_b, n_reg_at_run)
        # pre-r10 artifacts lack n_registry; fall back to the weak check
        elif n_b is not None:
            from anovos_spark import queries

            n_reg = len(queries.registry())
            if n_b >= n_reg:
                assert n_b == n_reg, (benches[-1], n_b, n_reg)
