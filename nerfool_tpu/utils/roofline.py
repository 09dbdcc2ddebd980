"""Roofline / MFU accounting for the benchmark (VERDICT r3 item 2).

Converts measured phase times into hardware-normalized figures:

* ``mfu_pct`` — achieved model FLOP/s as a percent of the chip's peak bf16
  matmul throughput. FLOPs come from XLA's own cost analysis of the compiled
  program (``compiled.cost_analysis()['flops']``) — the compiler's analytic
  count of the HLO it actually runs, which tracks the hand model (conv FLOPs
  = 2·kh·kw·cin·cout·out_h·out_w per conv; matmul = 2·M·N·K) while staying
  robust to fusion/rewrites. f32 phases can reach at most ~1/3 of the bf16
  peak (the MXU synthesizes f32 from 3+ bf16 passes), so their MFU is
  reported against bf16 peak with that ceiling noted, not silently rescaled.
* ``hbm_pct`` — XLA's bytes-accessed estimate over the measured time as a
  percent of peak HBM bandwidth. Fusion makes this an upper bound on true
  traffic; it still locates the phase on the roofline.
* gather demand — taps/s: every (view, ray, sample) needs one bilinear
  tap from the feature table and one from the rgb table. The per-tap engine
  issues exactly one packed superrow gather per tap, so taps/s == physical
  gather rows/s there, directly comparable to the measured ~47M rows/s
  issue-rate bound (BENCH_NOTES round-1 gather probe). The BSPG engine
  serves the same taps from contiguous per-(block,view) patch fetches —
  taps/s above 47M is the measured win over the issue-rate wall.

Peak numbers are per-chip datasheet values (TPU generations); unknown chips
(CPU test runs) report null MFU rather than a made-up number.
"""
from __future__ import annotations

# device_kind prefix -> (peak bf16 matmul TFLOP/s, HBM GB/s)
_CHIP_PEAKS = {
    "TPU v5 lite": (197.0, 819.0),   # v5e
    "TPU v5e": (197.0, 819.0),
    "TPU v5p": (459.0, 2765.0),
    "TPU v5": (197.0, 819.0),
    "TPU v4": (275.0, 1228.0),
    "TPU v6 lite": (918.0, 1640.0),  # trillium
    "TPU v6e": (918.0, 1640.0),
    "TPU v3": (123.0, 900.0),
    "TPU v2": (46.0, 700.0),
}

GATHER_ROWS_PER_SEC_BOUND = 47e6  # measured random-row issue-rate wall


def chip_specs(device=None):
    """(kind, peak_bf16_tflops, hbm_gbps) for the first / given device;
    peaks are None for unknown kinds (e.g. CPU test hosts)."""
    import jax

    dev = device or jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev))
    for prefix, (tf, gb) in _CHIP_PEAKS.items():
        if kind.startswith(prefix):
            return kind, tf, gb
    return kind, None, None


def program_costs(lowered_or_compiled):
    """(flops, bytes_accessed) from XLA cost analysis; (None, None) when the
    backend exposes no estimate."""
    try:
        compiled = lowered_or_compiled
        if hasattr(compiled, "compile"):
            compiled = compiled.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0] if ca else {}
        flops = ca.get("flops")
        byts = ca.get("bytes accessed")
        return (float(flops) if flops else None,
                float(byts) if byts else None)
    except Exception:
        return None, None


def phase_report(seconds, flops=None, bytes_accessed=None, executions=1,
                 device=None):
    """Roofline row for one measured phase.

    :param seconds: measured wall time for ``executions`` runs of the program
    :param flops: model FLOPs per execution (XLA cost analysis)
    :param bytes_accessed: HBM bytes per execution (XLA estimate, upper bound)
    :return: dict with tflops_per_sec / mfu_pct / gbps / hbm_pct (None where
        unknown) — every figure rounded for the one-line JSON
    """
    kind, peak_tf, peak_gb = chip_specs(device)
    out = {"chip": kind}
    if flops and seconds > 0:
        tfs = flops * executions / seconds / 1e12
        out["tflops_per_sec"] = round(tfs, 3)
        out["mfu_pct"] = round(100.0 * tfs / peak_tf, 2) if peak_tf else None
    if bytes_accessed and seconds > 0:
        gbs = bytes_accessed * executions / seconds / 1e9
        out["gbps"] = round(gbs, 1)
        out["hbm_pct"] = round(100.0 * gbs / peak_gb, 1) if peak_gb else None
    return out


def gather_report(n_rays, n_views, n_samples_total, seconds):
    """Gather-demand row: taps served per second vs the measured ~47M rows/s
    random-row issue-rate wall (== physical gather rows/s on the per-tap
    engine; the BSPG engine serves the same taps from contiguous patch
    fetches, so taps/s > the wall is the point of that engine)."""
    taps = float(n_rays) * n_views * n_samples_total
    tps = taps / seconds if seconds > 0 else None
    return {
        "taps_per_ray": n_views * n_samples_total,
        "taps_per_sec": round(tps, 1) if tps else None,
        "vs_47M_row_issue_bound": round(tps / GATHER_ROWS_PER_SEC_BOUND, 2)
        if tps else None,
    }
