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
        if peak_gb:
            pct = round(100.0 * gbs / peak_gb, 1)
            out["hbm_pct"] = pct
            if pct > 100.0:
                # XLA's "bytes accessed" is a pre-fusion per-op sum: operands
                # shared by fused consumers and remat re-reads are counted
                # once per USE, not once per HBM crossing, so the estimate
                # can exceed what the wall-clock could physically stream
                # (BENCH_r04's attack row: 120.5%). The wall is the truth;
                # >100% means the bound overcounts, not that the chip
                # exceeded its bandwidth.
                out["hbm_note"] = ("bytes-accessed is an XLA upper bound "
                                   "(fusion/remat reuse double-counted); "
                                   ">100% flags the bound, not the chip")
        else:
            out["hbm_pct"] = None
    return out


def gnt_aggregation_traffic(v, r, s, d=64, depth=8, bytes_per_el=2,
                            heads=4, fused_ra=False, fused_vt=False,
                            fused_chain=False):
    """Analytic HBM-traffic floor of the GNT aggregation chain (per ray
    batch), assuming perfect producer->consumer fusion (each materialized
    operand crosses HBM once per read and once per write — a LOWER bound on
    real traffic; XLA materializes at least these).

    Per ViewAttention block the big [V,R,S,D] operands move (reads+writes,
    in units of B = v*r*s*d*bytes): kv matmul 1R+2W, pos MLP ~1W (d-wide
    epilogue), attn assembly+MLP ~3R+2W, masked softmax over V ~2R+1W,
    weighted sum 3R -> ~13B per block (models/gnt.py ViewAttention).
    Per RayAttention the dominant materialization is the [R,H,S,S] score
    tensor: 1W (qk) + 2R+1W (softmax) + 1R (AV) = 5 passes, plus ~6 passes
    over the [R,S,D] q-side operands (qkv/out/FF). The ray-packed fold
    (ray_fold=2) does not change these byte counts — it halves ROWS at
    double lane width, attacking the VPU 64-lane padding waste, so its win
    shows up as a higher %-of-floor, not a lower floor.

    ``fused_ra`` (ops/ra_kernel.py, the shipped no-grad render default):
    scores never leave VMEM and the ~4 attention passes of the 6 q-side
    passes collapse to one read + one write, leaving ~2 attention passes
    plus the ~2 LN/FF passes that stay XLA either way (6 unfused -> 4
    fused). ``fused_vt`` (ops/vt_kernel.py): the view-side chain
    collapses to one read of k/pos/mask plus the D-wide output write —
    ~1.5 big-operand passes per depth instead of 13.

    :return: dict with total_gb and the floor seconds at the chip's peak
        HBM bandwidth (None off-TPU)
    """
    big = float(v) * r * s * d * bytes_per_el
    qside = float(r) * s * d * bytes_per_el
    score = float(r) * heads * s * s * bytes_per_el
    if fused_chain:
        # whole-chain kernel (ops/chain_kernel.py): gathered operands cross
        # HBM once (rf 35+4+1 ch), embeddings once (2x63 ch), q+attn out
        # once; per-tile weight streaming ~1 MB per 8-ray tile
        total = (float(v) * r * s * 40 * bytes_per_el
                 + float(r) * s * (126 + d + 1) * bytes_per_el
                 + (r / 8.0) * 1.0e6)
    else:
        vt_passes = 1.5 if fused_vt else 13.0
        score_passes = 0.0 if fused_ra else 5.0
        # of the ~6 q-side passes, ~4 are the attention chain (collapsing
        # to 1R+1W inside the kernel); the block's LN/FF stay XLA either way
        qside_passes = 4.0 if fused_ra else 6.0
        per_block = (vt_passes * big + score_passes * score
                     + qside_passes * qside)
        total = depth * per_block + 3.0 * big  # + entry rgbfeat MLP passes
    _, _, peak_gb = chip_specs()
    return {
        "total_gb": round(total / 1e9, 1),
        "fused_ra": fused_ra, "fused_vt": fused_vt,
        "fused_chain": fused_chain,
        "floor_s": round(total / (peak_gb * 1e9), 3) if peak_gb else None,
    }


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
