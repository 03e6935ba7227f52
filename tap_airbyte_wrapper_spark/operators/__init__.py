"""Relational operator layer — the transform surface over extracted
streams.  See SURVEY.md §2.3: the reference has none of these (its row-level
ops stop at stream maps); Spark built-ins supply them, these modules pin the
scale-correct composition."""

from .joins import (
    anti_join,
    asof_join,
    equi_join,
    fuzzy_self_join,
    point_in_time_join,
    range_join,
    salted_join,
    semi_join,
)
from .aggregates import (
    cube_agg,
    dedup_exact,
    dedup_latest,
    distinct_count,
    grouped_agg,
    grouping_sets_agg,
    histogram_quantiles,
    histogram_rollup,
    histogram_sketch_table,
    hll_rollup,
    hll_sketch_table,
    rollup_agg,
)
from .windows import (global_cumsum, global_distribution_ranks,
                      global_topk, ranked, running_agg, topk_per_group,
                      with_lag_lead)
from .merge import maintain_agg_snapshot, merge_upsert, scd2_history
from .graph import degrees, label_propagation, pagerank, triangle_count
from .setops import except_rows, intersect_rows, melt, union_by_name
from .timeseries import (
    detect_anomalies,
    gap_fill,
    resample,
    rolling_stats,
    time_bucket,
)
from .stats import (
    autocorrelation,
    bh_fdr,
    bootstrap_ci,
    chi_square_independence,
    icc_2_1,
    jarque_bera,
    kruskal_wallis,
    ks_test,
    mann_whitney_u,
    mutual_information,
    paired_t_test,
    proportion_z_test,
    seasonal_decompose,
    wasserstein_1d,
    welch_t_test,
    wilcoxon_signed_rank,
)
from .quality import (
    Expectation,
    column_correlations,
    distribution_drift,
    numeric_histogram,
    key_skew_profile,
    k_anonymity,
    cohen_kappa,
    fleiss_kappa,
    cusum_change_point,
    kendall_tau,
    mann_kendall_trend,
    sen_slope,
    krippendorff_alpha,
    benford_deviation,
    dp_noisy_counts,
    schema_drift_report,
    weighted_kappa,
    spearman_correlation,
    partition_skew_report,
    profile_table,
    snapshot_diff,
    validate_expectations,
)

__all__ = [
    "equi_join", "semi_join", "anti_join", "asof_join", "range_join",
    "salted_join", "fuzzy_self_join", "point_in_time_join",
    "grouped_agg", "cube_agg", "rollup_agg", "grouping_sets_agg",
    "distinct_count", "dedup_exact", "dedup_latest",
    "hll_sketch_table", "hll_rollup",
    "histogram_sketch_table", "histogram_rollup", "histogram_quantiles",
    "ranked", "with_lag_lead", "running_agg", "topk_per_group", "global_topk",
    "global_distribution_ranks",
    "global_cumsum",
    "union_by_name", "intersect_rows", "except_rows", "melt",
    "merge_upsert",
    "scd2_history",
    "maintain_agg_snapshot",
    "time_bucket", "resample", "gap_fill", "rolling_stats",
    "detect_anomalies",
    "profile_table", "Expectation", "validate_expectations",
    "snapshot_diff",
    "numeric_histogram", "column_correlations", "partition_skew_report", "key_skew_profile", "cohen_kappa", "fleiss_kappa", "krippendorff_alpha", "benford_deviation", "dp_noisy_counts", "schema_drift_report", "weighted_kappa", "spearman_correlation", "kendall_tau", "mann_kendall_trend", "sen_slope", "cusum_change_point", "k_anonymity",
    "ks_test", "mann_whitney_u", "welch_t_test", "chi_square_independence",
    "bootstrap_ci", "autocorrelation", "jarque_bera", "proportion_z_test",
    "seasonal_decompose", "bh_fdr", "mutual_information",
    "wilcoxon_signed_rank", "paired_t_test", "wasserstein_1d",
    "kruskal_wallis", "icc_2_1",
    "pagerank", "degrees", "triangle_count", "label_propagation",
    "distribution_drift",
]
