"""Driver-surface contract: the three `__ray_entry__` exports must stay
mutually consistent — every oracle names a registered query, rotation
returns a permutation of the registry, and never-driver-checked queries
sort ahead of long-green ones (the coverage-rotation invariant VERDICT
r2 #2 asked for)."""

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _entry():
    return importlib.import_module("__ray_entry__")


def test_every_oracle_names_a_registered_query():
    e = _entry()
    q = e._queries_in_registration_order()
    dangling = [k for k in e.oracle_sql() if k not in q]
    assert dangling == []


def test_rotation_is_a_permutation_of_the_registry():
    e = _entry()
    base = e._queries_in_registration_order()
    rotated = e.queries()
    assert set(rotated) == set(base)
    assert len(rotated) == len(base)


def test_unverified_queries_sort_before_driver_green_ones():
    e = _entry()
    seen = e._driver_verified_rounds()
    if not seen:  # no CORRECTNESS_r*.json on disk — nothing to assert
        return
    order = list(e.queries())
    ranks = [seen.get(k, 0) for k in order]
    assert ranks == sorted(ranks)


def test_all_queries_are_callables():
    e = _entry()
    assert all(callable(f) for f in e._queries_in_registration_order().values())
