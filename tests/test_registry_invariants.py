"""Registry-wide name<->function binding invariant.

Round 8 shipped a decorator-orphaning bug: ``quantile_normalize_binned``
was inserted between an existing ``@register("op_quantile_normalize_lengths",
...)`` decorator and the function it used to decorate, silently re-pointing
the registry at the binned approximation while the exact operator became
dead code (VERDICT r8 "What's wrong" #1). This test makes that whole defect
class an import-time failure: every registry value's ``__name__`` must
equal its key, or match one of the explicitly-listed aliasing conventions.
"""

import __spark_entry__ as m

# The star family registers plan functions named q1..q5_* under a
# "star_"-prefixed registry key (plans/star.py) — the one sanctioned alias.
_ALIAS_OK = {
    "star_q1_monthly_sales": "q1_monthly_sales",
    "star_q2_top10_parts": "q2_top10_parts",
    "star_q3_top5_customers": "q3_top5_customers",
    "star_q4_sales_by_nation": "q4_sales_by_nation",
    "star_q5_priority_popularity": "q5_priority_popularity",
}


def test_registry_name_matches_function():
    bad = []
    for key, fn in m.queries().items():
        name = getattr(fn, "__name__", None)
        if name == key:
            continue
        if _ALIAS_OK.get(key) == name:
            continue
        bad.append((key, name))
    assert not bad, (
        "registry key / function __name__ mismatch — a @register decorator "
        f"has migrated onto the wrong function: {bad}"
    )


def test_registry_functions_unique():
    """No function object may serve two registry names (a second symptom
    of decorator migration: the displaced operator re-registered under a
    neighbour's key)."""
    seen = {}
    dupes = []
    for key, fn in m.queries().items():
        if fn in seen:
            dupes.append((seen[fn], key))
        seen[fn] = key
    assert not dupes, f"one function registered under two names: {dupes}"


def test_priority_head_all_present_and_unique():
    head = m._PRIORITY_HEAD
    assert len(head) == len(set(head)), "duplicate names in _PRIORITY_HEAD"
    qs = m.queries()
    missing = [n for n in head if n not in qs]
    assert not missing, f"_PRIORITY_HEAD names absent from registry: {missing}"


def test_leakage_split_bands_match_sampling_module():
    """op_split_leakage_near_dup pins the 80/10/10 hex bands as literals
    (import-cycle avoidance); they must stay equal to the sampling
    module's, or the leakage audit would audit a different split than
    op_split_train_eval assigns."""
    from gravity_books_datalakehouse_spark.operators.dedup import (
        _LEAK_T80,
        _LEAK_T90,
    )
    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        _T80,
        _T90,
    )

    assert (_LEAK_T80, _LEAK_T90) == (_T80, _T90)
