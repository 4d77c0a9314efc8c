"""Plan evidence for the star-join / pivot / set-op queries: the physical
plans must show broadcast dims with pushed-down filters and single-exchange
aggregates — the shapes the 100 TB story depends on."""
from __future__ import annotations

import __spark_entry__ as E

SF = '/root/testdata/sf0.001'


def _plan(spark, name):
    df = E.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString('formatted')
    )


def test_star_join_broadcasts_all_dims(spark):
    plan = _plan(spark, 'orders_star_join')
    tree = plan.split('\n\n')[0]
    assert tree.count('BroadcastHashJoin') == 3, tree
    assert 'SortMergeJoin' not in tree
    # the region predicate reaches the parquet scan
    assert 'PushedFilters' in plan and 'r_name' in plan
    # only the final rollup shuffles: every other Exchange is a broadcast
    shuffles = tree.count('Exchange') - tree.count('BroadcastExchange')
    assert shuffles == 1, tree


def test_pivot_is_single_aggregate_exchange(spark):
    plan = _plan(spark, 'events_pivot')
    tree = plan.split('\n\n')[0]
    assert tree.count('Exchange') == 1, tree
    assert 'HashAggregate' in tree


def test_set_ops_results_consistent(spark):
    got = {r['gate']: r['n_docs'] for r in E.queries()['docs_set_ops'](spark, SF).collect()}
    d = spark.read.parquet(f'{SF}/documents.parquet')
    n_en = d.filter(d.lang == 'en').count()
    # both ⊆ en docs; both + quality_only = all quality-passing docs
    assert got.get('both', 0) <= n_en
    assert got.get('both', 0) + got.get('quality_only', 0) > 0
