"""Observables and analysis suite (well stats, RDF, plots)."""

from flowstate_tpu.analysis.ess import (
    autocorrelation,
    effective_sample_size,
    integrated_autocorr_time,
    sampling_efficiency,
)
from flowstate_tpu.analysis.mbar import (
    mbar_expectation,
    mbar_free_energies,
    mbar_log_weights,
    pt_well_delta_f,
)
from flowstate_tpu.analysis.rdf import calculate_pair_correlation
from flowstate_tpu.analysis.wells import (
    OUTSIDE,
    STATE_LABELS,
    WELL_A,
    WELL_B,
    average_free_energy,
    calculate_well_statistics,
    classify_particles,
    state_histogram_counts,
    well_centers,
)

_PLOT_EXPORTS = ("ICL_COLOR_CYCLE", "get_icl_heatmap_cmap",
                 "set_icl_color_cycle")


def __getattr__(name):
    # Lazy: plots imports matplotlib + pyplot and pins the Agg backend; keep
    # that out of consumers that only want the numeric analysis (bench,
    # experiment drivers importing effective_sample_size).
    if name in _PLOT_EXPORTS:
        from flowstate_tpu.analysis import plots

        return getattr(plots, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "classify_particles", "calculate_well_statistics",
    "state_histogram_counts", "average_free_energy", "well_centers",
    "calculate_pair_correlation",
    "set_icl_color_cycle", "get_icl_heatmap_cmap", "ICL_COLOR_CYCLE",
    "mbar_free_energies", "mbar_log_weights", "mbar_expectation",
    "pt_well_delta_f",
    "effective_sample_size", "integrated_autocorr_time", "autocorrelation",
    "sampling_efficiency",
    "WELL_A", "WELL_B", "OUTSIDE", "STATE_LABELS",
]
