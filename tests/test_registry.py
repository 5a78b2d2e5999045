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
    CORRECTNESS_r*.json lands (ADVICE r8): stale state silently skews the
    never-sampled-first registry ordering for the next driver round."""
    import glob
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expected = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    )
    with open(os.path.join(root, "tools", "rotation_state.json")) as f:
        state = json.load(f)
    assert sorted(state.get("source_artifacts", [])) == expected, (
        "rotation_state.json is stale — run tools/update_rotation_state.py"
    )
    # counts must be sane ints (bool-typed values are hand-edit artifacts)
    for k, v in state.get("counts", {}).items():
        assert isinstance(v, int) and not isinstance(v, bool), (k, v)


def test_evidence_artifact_counts_match_registry():
    """The pinned current-round bench/oracle artifacts must cover the FULL
    registry (r8 verdict: prose said 168 while the registry had 170).
    Older rounds' artifacts are historical and exempt."""
    import glob
    import json
    import re

    from anovos_spark import queries

    n_reg = len(queries.registry())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    benches = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    if benches:
        with open(benches[-1]) as f:
            raw = json.load(f)
        bench = raw.get("parsed", raw)  # driver wraps bench stdout
        n_b = bench.get("n_queries")
        # only enforce once this round's artifact exists; the previous
        # round's count is allowed to lag a growing registry
        if n_b is not None and n_b >= n_reg:
            assert n_b == n_reg, (benches[-1], n_b, n_reg)
