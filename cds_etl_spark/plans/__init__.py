"""Query-plan package: the declared oracle-checkable query registry.

``registry`` holds the (QUERIES, ORACLE_SQL) contract and the
``@query`` decorator; the ``q_*`` family modules populate it on
import. Import ORDER below IS the registration order — the driver's
fallback ordering for ungraded entries — so modules are imported in
the exact sequence the former single queries module registered them.
"""

from cds_etl_spark.plans.registry import ORACLE_SQL, QUERIES
from cds_etl_spark.plans import (  # noqa: E402,F401  (import = registration)
    q_relational,
    q_dedup_text,
    q_reshape_window,
    q_sampling_llm,
    q_tpch_graph,
    q_corpus_quality,
    q_monitoring_stats,
    q_commerce,
    q_eval_advanced,
    q_ml_graph_stats,
    q_ml_graph_stats2,
    q_stats_tests,
    q_experiments,
    q_commerce_ops,
    q_assoc_eval,
    q_diagnostics,
    q_diagnostics2,
    q_diagnostics3,
)

__all__ = ["QUERIES", "ORACLE_SQL"]
