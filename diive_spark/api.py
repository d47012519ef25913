"""Reference-name facade: the class/function names a diive user knows,
mapped onto the Spark-first implementations.

A reference user migrating a notebook can keep their vocabulary —
``zScore``, ``LocalSD``, ``GapFinder``, ``RandomForestTS``,
``resample_series_to_30MIN``, … — while every call routes to the
distributed operator (cited to the reference file:line in the target
function's docstring).  Each entry below is a THIN alias: no logic
lives here, so the facade cannot drift from the tested operators.

Class-shaped reference APIs (setter/getter pandas plumbing) map to the
functional Spark form: ``zScore(series).calc(); zScore.get_flag()``
becomes ``zscore_flag(df)`` returning the frame with the flag column —
the stepwise/QCF composition is ``ScreeningPipeline``.
"""

from __future__ import annotations

from .operators.analyses import (
    diel_cycle,
    find_optimum_range as FindOptimumRange,
    histogram as Histogram,
    lagged_variants as create_lagged_variants,
    percentile_ladder as percentiles,
    quantile_xy_agg_z as QuantileXYAggZ,
    rolling_variants,
    sorting_bins as SortingBinsMethod,
    sstats,
)
from .operators.dedup import exact_dedup, minhash_dedup
from .operators.fits import bin_fitter as BinFitter, quadratic_fit as QuadraticFit
from .operators.flux import (
    critical_heat_days_p95 as FluxCriticalHeatDaysP95,
    co2_penalty as CO2penalty,
    daily_full_gate,
    detection_limit_from_far_lags as FluxDetectionLimit,
    random_uncertainty_pas20 as RandomUncertaintyPAS20,
    ustar_scenarios as UstarThresholdConstantScenarios,
)
from .operators.gaps import (
    backfill_limited,
    gap_runs as GapFinder,
    interpolate_limited as linear_interpolation,
    lookup_table_fill,
)
from .operators.joins import asof_join, interval_join, nearest_value as find_nearest_val
from .operators.lof import lof_flag as LocalOutlierFactor
from .operators.ml_gapfill import (
    optimize_rf_params as OptimizeParamsRFTS,
    quick_rf_fill as QuickFillRFTS,
    rf_gapfill as RandomForestTS,
)
from .operators.outliers import (
    abs_limits_flag as AbsoluteLimits,
    abs_limits_stratified_flag as AbsoluteLimitsDaytimeNighttime,
    local_sd_flag as LocalSD,
    manual_removal_flag as ManualRemoval,
    missing_vals_flag as MissingValues,
    repeat_until_clean,
    zscore_flag as zScore,
    zscore_increments_flag as zScoreIncrements,
)
from .operators.pipeline import ScreeningPipeline as StepwiseOutlierDetection
from .operators.pipeline import ScreeningPipeline as FluxProcessingChain
from .operators.qcf import apply_qcf, flag_sums, qcf_flag as FlagQCF, qcf_report
from .operators.resample import (
    aggregated_as_hires,
    bucket_rollup as resample_series_to_30MIN,
    calendar_rollup as resample_df,
    create_random_gaps,
)
from .operators.timegrid import (
    complete_grid as continuous_timestamp_freq,
    dedup_keep_last as remove_index_duplicates,
    detect_freq as DetectFrequency,
    freq_groups as detect_freq_groups,
)
from .sources.filetypes import read_filetype as ReadFileType
from .sources.filetypes import read_filetype_many as MultiDataFileReader
from .sources.readers import export_fluxnet as FormatEddyProFluxnetFileForUpload

# Engine-native additions (no reference counterpart — the target-side
# analytics battery), re-exported under their own names so notebook
# users get one import surface:
from .functions.dgim import dgim_add, dgim_estimate  # noqa: E402
from .operators.analyses import (  # noqa: E402
    dgim_window_count,
    mann_kendall_bins,
    seasonal_mann_kendall,
)
from .operators.fits import isotonic_fit  # noqa: E402
from .operators.similarity import rrf_fusion_topk  # noqa: E402
from .operators.spectral import (  # noqa: E402
    ccf_peak_lag,
    cointegration_pairs,
    spectral_entropy,
)

__all__ = [n for n in dir() if not n.startswith("_")]
