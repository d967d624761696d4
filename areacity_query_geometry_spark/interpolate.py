"""Kernel-weighted spatial interpolation (IDW's bounded-kernel
relative): estimate a continuous surface at probe locations from
scattered point samples — the raster-from-points face of the
analytics surface (raster_zonal_sum aggregates a raster BY regions;
this BUILDS the surface from samples).

Weight kernel: w(d) = ρ² − d² (Shepard-style inverse-distance
flavour with compact support). Chosen over classic 1/d^p
deliberately: on the repo's dyadic lattice every d² and ρ² is an
exact multiple of 2⁻¹², so each weight, each v·w product and every
partial sum is exactly representable — the aggregation is
order-independent and the DuckDB oracle matches bit-for-bit, which
no divided weight can guarantee (CLAUDE.md division-free rule). The
operator returns the numerator/denominator pair instead of the
ratio for the same reason; callers divide at the edge.

100 TB shape: one cell-cover equi-join (knn.py::range_point_join —
never a cross join; sample columns ride the existing join rather
than a second points-sized value shuffle) followed by one
map-side-combining aggregation keyed by probe. Probe skew (a probe
in a dense city) is bounded by the kernel's compact support — the
candidate set is the ρ-disc's population, not the corpus.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import knn


def kernel_interpolate(probes: DataFrame, points: DataFrame,
                       radius_deg: float, res: int = 6,
                       value_col: str = "val") -> DataFrame:
    """probes: (probe_id, lng, lat); points: (point_id, lng, lat,
    value_col). Returns per probe with ≥1 sample in range:
    (probe_id, n_samples, num, den) where num = Σ v·(ρ²−d²),
    den = Σ (ρ²−d²); the interpolated value is num/den. Samples at
    exactly d = ρ carry weight 0 in both engines."""
    pairs = knn.range_point_join(probes, points, radius_deg, res,
                                 point_cols=(value_col,))
    rho2 = radius_deg * radius_deg
    wgt = F.expr(f"{rho2!r} - d2")
    return (pairs.groupBy("probe_id")
            .agg(F.count("*").alias("n_samples"),
                 F.sum(F.col(value_col) * wgt).alias("num"),
                 F.sum(wgt).alias("den")))
