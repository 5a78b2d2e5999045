"""Executed-plan guard for single-partition (empty-partitionBy) windows.

The repo's rule: a global window is acceptable ONLY over bounded
metadata frames (group counts, top-k vocab, distinct dates, fitted
params).  These helpers read the ACTUAL executed plan metrics after an
action and return, for every Window fed by a single-partition Exchange,
the number of records that crossed that exchange — so a refactor that
silently points a global window at a data-sized frame fails the tests
that assert the bound.
"""

from __future__ import annotations


def _metrics(node) -> dict:
    out = {}
    try:
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            out[kv._1()] = kv._2().value()
    except Exception:
        pass
    return out


def _children(node):
    res = []
    try:
        ch = node.children()
        res = [ch.apply(i) for i in range(ch.size())]
    except Exception:
        pass
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        try:
            res.append(node.executedPlan())
        except Exception:
            pass
    if "QueryStage" in name:
        try:
            res.append(node.plan())
        except Exception:
            pass
    return res


def _find_first_exchange(node):
    if node.nodeName() == "Exchange":
        return node
    for c in _children(node):
        found = _find_first_exchange(c)
        if found is not None:
            return found
    return None


def single_partition_window_inputs(df) -> list[int]:
    """Run df (collect) and return the records-read counts of every
    single-partition Exchange directly feeding a Window node."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    sizes, seen = [], set()

    def walk(node):
        key = id(node)
        if key in seen:
            return
        seen.add(key)
        if node.nodeName() == "Window":
            ex = _find_first_exchange(node)
            if ex is not None:
                m = _metrics(ex)
                if m.get("numPartitions") == 1:
                    sizes.append(int(m.get("recordsRead", -1)))
        for c in _children(node):
            walk(c)

    walk(plan)
    return sizes
