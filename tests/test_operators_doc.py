"""OPERATORS.md ↔ registry consistency (VERDICT r9 item #7): the coverage
matrix went stale twice (r9 found a superseded-UDF description and a ✅
that had gained an oracle).  This pins both directions:

- every ``q:<token>`` in OPERATORS.md must match ≥1 registry name
  (tokens may be fnmatch patterns, e.g. ``q:attribute_binning_*`` or the
  TPC-H family ``q:q[0-9]*``);
- every registry name must be matched by ≥1 doc token, so a new query
  can't land without a row in the coverage matrix.
"""

import fnmatch
import os
import re


def _doc_tokens():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "OPERATORS.md")) as f:
        src = f.read()
    return set(re.findall(r"q:([A-Za-z0-9_*\[\]\-]+)", src))


def test_doc_tokens_resolve_and_cover_registry():
    from anovos_spark import queries

    reg = set(queries.registry().keys())
    toks = _doc_tokens()
    unresolved = sorted(
        t for t in toks if not any(fnmatch.fnmatch(n, t) for n in reg)
    )
    assert not unresolved, (
        f"OPERATORS.md references queries not in the registry: {unresolved}"
    )
    covered = {n for n in reg if any(fnmatch.fnmatch(n, t) for t in toks)}
    undocumented = sorted(reg - covered)
    assert not undocumented, (
        f"registry queries missing from OPERATORS.md: {undocumented}"
    )


def test_doc_has_no_superseded_udf_claims():
    """The engine has zero row-at-a-time Python UDFs (plan_audit check 35);
    the doc's "here" column must not describe OUR implementation as a UDF
    (the r9 stale line: "bbox-prefiltered UDF").  Mentions in the
    reference column and explicit negations (no/zero/without UDF) are
    fine; pandas_udf/Arrow is fine."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "OPERATORS.md")) as f:
        lines = f.readlines()
    offenders = []
    for i, l in enumerate(lines, 1):
        if not l.strip().startswith("|"):
            continue
        cells = [c.strip() for c in l.strip().strip("|").split("|")]
        if len(cells) < 2:
            continue
        here = cells[1]
        if re.search(r"(?<!pandas[-_ ])\bUDF", here) and not re.search(
            r"\b(no|zero|without)\b[^|]*UDF", here
        ):
            offenders.append(f"OPERATORS.md:{i}: {here}")
    assert not offenders, offenders
