"""Physical-plan scale assertions over EVERY contract query (SURVEY.md §7.4).

The 100-TB question, asked of the plans themselves: no contract query may
contain a partition-less Window over an un-limited input (all rows through
one reducer). Partition-less windows are allowed only below a GlobalLimit /
TakeOrderedAndProject — ranking an already-top-N'd result is O(k).
"""

from __future__ import annotations

import pytest

from dense_retriever_spark.plans import global_window_violations

SF_DIR = "/root/testdata/sf0.001"


def _query_items():
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries().items())


@pytest.mark.parametrize("name,fn", _query_items(), ids=[n for n, _ in _query_items()])
def test_no_unbounded_global_window(spark, name, fn):
    df = fn(spark, SF_DIR)
    viol = global_window_violations(df)
    assert not viol, f"{name}: partition-less Window over un-limited input: {viol}"
