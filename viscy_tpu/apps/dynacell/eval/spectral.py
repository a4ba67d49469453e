"""Spectral image-quality metrics: spectral-PCC, multiband EV, FSC.

Pure-numpy rebuild of the reference's frequency-domain evaluation
(``applications/dynacell/src/dynacell/evaluation/spectral_pcc/evaluate.py``
and the ``cubic.metrics.bandlimited`` primitives it calls): the math is
FFT + radial binning, which needs no GPU library — volumes are evaluated
one (FOV, t) at a time on the host while the TPU runs inference.

Physical-frequency convention: ``spacing`` is the per-axis voxel size;
frequencies from ``np.fft.fftfreq(n, d=spacing)`` are cycles per
physical unit, so radial bins respect anisotropic Z sampling.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "tukey_apodize",
    "radial_frequencies",
    "radial_power_spectrum",
    "estimate_noise_floor",
    "spectral_weights",
    "wiener_spectral_weights",
    "snr_adaptive_weights",
    "spectral_pcc",
    "band_limited_pcc",
    "multiband_ev_score",
    "fsc_resolution",
    "trimmed_mad_sigma2",
]


# -- apodization ---------------------------------------------------------------
def _tukey_window(n: int, alpha: float = 0.5) -> np.ndarray:
    """1-D Tukey (tapered cosine) window."""
    if alpha <= 0:
        return np.ones(n)
    if alpha >= 1:
        return np.hanning(n)
    x = np.linspace(0.0, 1.0, n)
    w = np.ones(n)
    edge = alpha / 2.0
    lo = x < edge
    hi = x >= 1 - edge
    w[lo] = 0.5 * (1 + np.cos(np.pi * (2 * x[lo] / alpha - 1)))
    w[hi] = 0.5 * (1 + np.cos(np.pi * (2 * x[hi] / alpha - 2 / alpha + 1)))
    return w


def tukey_apodize(img: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Separable Tukey apodization over every axis (suppresses FFT edge
    artifacts before spectral analysis; reference uses ``tukey`` by default)."""
    out = img.astype(np.float32, copy=True)
    for axis, n in enumerate(img.shape):
        w = _tukey_window(n, alpha).astype(np.float32)
        shape = [1] * img.ndim
        shape[axis] = n
        out *= w.reshape(shape)
    return out


_APODIZATION_FNS = {
    "tukey": tukey_apodize,
    "none": lambda x: x.astype(np.float32, copy=False),
}


# -- radial machinery ----------------------------------------------------------
def _normalize_spacing(spacing, ndim: int) -> list[float]:
    if spacing is None:
        return [1.0] * ndim
    if np.isscalar(spacing):
        return [float(spacing)] * ndim
    spacing = [float(s) for s in spacing]
    if len(spacing) != ndim:
        raise ValueError(f"spacing has {len(spacing)} entries for a {ndim}-D image")
    return spacing


def radial_frequencies(shape, spacing=None) -> np.ndarray:
    """Radial spatial-frequency magnitude map (cycles/physical unit)."""
    spacing = _normalize_spacing(spacing, len(shape))
    k2 = np.zeros(shape, np.float32)
    for axis, (n, d) in enumerate(zip(shape, spacing)):
        f = np.fft.fftfreq(n, d=d).astype(np.float32)
        view = [1] * len(shape)
        view[axis] = n
        k2 = k2 + f.reshape(view) ** 2
    return np.sqrt(k2)


def _radial_bins(shape, spacing, bin_delta: float = 1.0):
    """Radial bin edges + per-voxel bin ids for the given shape.

    Bin width is ``bin_delta`` Fourier pixels of the *finest* axis
    (``1 / (n_max * min_spacing)`` frequency units), up to the radial
    Nyquist of the most limiting axis; voxels above Nyquist get id -1.
    """
    spacing = _normalize_spacing(spacing, len(shape))
    k = radial_frequencies(shape, spacing)
    df = min(1.0 / (n * d) for n, d in zip(shape, spacing)) * bin_delta
    k_nyq = min(1.0 / (2.0 * d) for d in spacing)
    edges = np.arange(0.0, k_nyq + df, df, dtype=np.float32)
    bid = np.floor(k / df).astype(np.int32)
    bid[k > k_nyq] = -1
    bid[bid >= len(edges) - 1] = -1
    return edges, bid


def radial_power_spectrum(
    img: np.ndarray, spacing=None, bin_delta: float = 1.0
) -> tuple[np.ndarray, np.ndarray]:
    """Radially-binned power spectrum.

    Returns ``(radii, power)`` where ``radii`` are bin-center frequencies
    and ``power`` the mean ``|F|^2`` per bin. The input is mean-centered
    first (so the DC bin reflects structure, not offset).
    """
    x = img.astype(np.float32)
    x = x - x.mean()
    F = np.fft.fftn(x)
    p = np.abs(F) ** 2
    edges, bid = _radial_bins(img.shape, spacing, bin_delta)
    nbins = len(edges) - 1
    flat_bid = bid.ravel()
    valid = flat_bid >= 0
    sums = np.bincount(flat_bid[valid], weights=p.ravel()[valid], minlength=nbins)
    counts = np.bincount(flat_bid[valid], minlength=nbins)
    power = np.divide(sums, counts, out=np.zeros(nbins), where=counts > 0)
    radii = (edges[:-1] + edges[1:]) / 2.0
    return radii.astype(np.float32), power.astype(np.float32)


def estimate_noise_floor(
    radii: np.ndarray, power: np.ndarray, tail_fraction: float = 0.2
) -> float:
    """Noise floor = median power of the high-frequency tail.

    The top ``tail_fraction`` of radial bins is assumed noise-dominated
    (beyond the optical cutoff), matching the reference's estimator.
    """
    n = len(power)
    n_tail = max(1, int(round(n * tail_fraction)))
    return float(np.median(power[n - n_tail :]))


def estimate_gt_noise_floor(gt: np.ndarray, spacing=None, bin_delta: float = 1.0, tail_fraction: float = 0.2) -> float:
    """Noise floor from a GT volume, mean-filling registration zeros first
    (reference ``estimate_gt_noise_floor``). Fit once on t=0 and freeze."""
    x = gt.astype(np.float32)
    mask = x > 0
    if not mask.all() and mask.any():
        x = x.copy()
        x[~mask] = float(x[mask].mean())
    radii, power = radial_power_spectrum(x, spacing=spacing, bin_delta=bin_delta)
    return estimate_noise_floor(radii, power, tail_fraction=tail_fraction)


# -- weights -------------------------------------------------------------------
def spectral_weights(
    radii: np.ndarray, power: np.ndarray, noise_floor: float, cutoff: float | None = None
) -> np.ndarray:
    """Subtract-and-normalize weights: max(P - N, 0) / P (reference default)."""
    w = np.maximum(power - noise_floor, 0.0) / np.maximum(power, 1e-30)
    if cutoff is not None:
        w = np.where(radii > cutoff, 0.0, w)
    return w.astype(np.float32)


def wiener_spectral_weights(
    radii: np.ndarray, power: np.ndarray, noise_floor: float, cutoff: float | None = None
) -> np.ndarray:
    """Wiener-style weights: P^2 / (P^2 + N^2) — bounded [0, 1]."""
    n2 = noise_floor**2
    w = power**2 / (power**2 + n2)
    if cutoff is not None:
        w = np.where(radii > cutoff, 0.0, w)
    return w.astype(np.float32)


def snr_adaptive_weights(
    radii: np.ndarray,
    power: np.ndarray,
    noise_floor: float,
    cutoff: float | None = None,
    method: str = "snr_squared",
) -> np.ndarray:
    """SNR-adaptive weights: strong preference for high-SNR bins.

    ``snr_squared``: max(SNR - 1, 0)^2; ``log_snr``: max(log2(SNR), 0).
    """
    snr = power / max(noise_floor, 1e-30)
    if method == "snr_squared":
        w = np.maximum(snr - 1.0, 0.0) ** 2
    elif method == "log_snr":
        w = np.maximum(np.log2(np.maximum(snr, 1.0)), 0.0)
    else:
        raise ValueError(f"Unknown SNR-adaptive method: {method!r}")
    if cutoff is not None:
        w = np.where(radii > cutoff, 0.0, w)
    return w.astype(np.float32)


_WEIGHTING_FNS = {
    "subtract": spectral_weights,
    "wiener": wiener_spectral_weights,
    "snr_squared": lambda r, p, n, cutoff=None: snr_adaptive_weights(r, p, n, cutoff, "snr_squared"),
    "log_snr": lambda r, p, n, cutoff=None: snr_adaptive_weights(r, p, n, cutoff, "log_snr"),
}


# -- spectral PCC --------------------------------------------------------------
def spectral_pcc(
    prediction: np.ndarray,
    target: np.ndarray,
    spacing=None,
    *,
    noise_floor: float | None = None,
    bin_delta: float = 1.0,
    cutoff: float | None = None,
    apodization: str = "tukey",
    weighting: str = "subtract",
    nbins_low: int = 0,
    taper_low: int = 0,
    tail_fraction: float = 0.2,
    smooth: bool = False,
) -> float:
    """Noise-aware frequency-weighted Pearson correlation.

    Weighted cosine similarity of the Fourier transforms:
    ``sum(W * Re(F_p conj(F_t))) / sqrt(sum(W |F_p|^2) sum(W |F_t|^2))``
    with per-radial-bin weights from the target's power spectrum versus a
    noise floor (estimated from the high-frequency tail when not frozen),
    optional hard ``cutoff`` frequency and ``nbins_low`` DC-side exclusion.
    Matches the reference ``_spectral_pcc_fixed_noise`` /
    ``cubic.metrics.bandlimited.spectral_pcc`` behavior.
    """
    if prediction.shape != target.shape:
        raise ValueError(f"shape mismatch {prediction.shape} vs {target.shape}")
    spacing = _normalize_spacing(spacing, target.ndim)
    apo = _APODIZATION_FNS[apodization]

    pred = prediction.astype(np.float32) - float(np.mean(prediction))
    targ = target.astype(np.float32) - float(np.mean(target))
    pred = apo(pred)
    targ = apo(targ)

    F_pred = np.fft.fftn(pred)
    F_targ = np.fft.fftn(targ)

    radii, power = radial_power_spectrum(target, spacing=spacing, bin_delta=bin_delta)
    if noise_floor is None:
        noise_floor = estimate_noise_floor(radii, power, tail_fraction)
    w_bins = _WEIGHTING_FNS[weighting](radii, power, noise_floor, cutoff=cutoff)
    if smooth and len(w_bins) >= 3:
        # Median-filter the weight curve (reference ``smooth=True`` variant,
        # used for the Spectral_PCC_Smooth_2D column): suppresses per-bin
        # noise-floor jitter without moving the weight mass.
        from scipy.ndimage import median_filter

        w_bins = median_filter(w_bins, size=5, mode="nearest")

    nbl = min(int(nbins_low), len(w_bins))
    if nbl > 0:
        w_bins = w_bins.copy()
        w_bins[:nbl] = 0.0
    tpl = min(int(taper_low), len(w_bins))
    if tpl > 0:
        # Smooth low-k exclusion: linear ramp 0 -> 1 over the first
        # ``taper_low`` bins (the soft alternative to nbins_low's hard
        # cut; swept by the reference's diagnostic_real taper study).
        w_bins = w_bins.copy()
        w_bins[:tpl] *= np.arange(tpl, dtype=np.float32) / float(tpl)
    if float(w_bins.max(initial=0.0)) == 0.0:
        return 0.0

    _, bid = _radial_bins(target.shape, spacing, bin_delta)
    flat_bid = bid.ravel()
    valid = flat_bid >= 0
    W = np.zeros(flat_bid.shape, np.float32)
    W[valid] = w_bins[flat_bid[valid]]

    cross = np.real(F_pred.ravel() * np.conj(F_targ.ravel()))
    num = float(np.sum(W * cross))
    denom = np.sqrt(
        float(np.sum(W * np.abs(F_pred.ravel()) ** 2))
        * float(np.sum(W * np.abs(F_targ.ravel()) ** 2))
    )
    if denom < 1e-12:
        return 0.0
    return float(np.clip(num / denom, -1.0, 1.0))


def band_limited_pcc(
    prediction: np.ndarray,
    target: np.ndarray,
    spacing=None,
    *,
    k_lo: float = 0.0,
    k_hi: float = np.inf,
    apodization: str = "tukey",
) -> float:
    """Pearson correlation restricted to one radial frequency band
    (uniform weights inside [k_lo, k_hi], zero outside)."""
    spacing = _normalize_spacing(spacing, target.ndim)
    apo = _APODIZATION_FNS[apodization]
    pred = apo(prediction.astype(np.float32) - float(np.mean(prediction)))
    targ = apo(target.astype(np.float32) - float(np.mean(target)))
    F_pred = np.fft.fftn(pred).ravel()
    F_targ = np.fft.fftn(targ).ravel()
    k = radial_frequencies(target.shape, spacing).ravel()
    sel = (k >= k_lo) & (k <= k_hi)
    if not sel.any():
        return 0.0
    num = float(np.sum(np.real(F_pred[sel] * np.conj(F_targ[sel]))))
    denom = np.sqrt(
        float(np.sum(np.abs(F_pred[sel]) ** 2)) * float(np.sum(np.abs(F_targ[sel]) ** 2))
    )
    return float(np.clip(num / denom, -1.0, 1.0)) if denom > 1e-12 else 0.0


# -- multiband EV --------------------------------------------------------------
def _butterworth_lp(k_rad: np.ndarray, cutoff: float, order: int = 2) -> np.ndarray:
    """Amplitude Butterworth low-pass: 1 / sqrt(1 + (k/k_c)^(2n))."""
    return 1.0 / np.sqrt(1.0 + (k_rad / max(cutoff, 1e-30)) ** (2 * order))


def trimmed_mad_sigma2(arr: np.ndarray, trim_quantile: float = 0.85) -> tuple[float, int]:
    """Noise variance via trimmed MAD: drop the top |value| quantile
    (structure), then (1.4826 * MAD)^2 on the rest."""
    flat = np.asarray(arr, np.float64).ravel()
    threshold = np.quantile(np.abs(flat), trim_quantile)
    kept = flat[np.abs(flat) <= threshold]
    if len(kept) < 10:
        return float(np.var(flat)), len(kept)
    med = np.median(kept)
    mad = 1.4826 * float(np.median(np.abs(kept - med)))
    return mad**2, len(kept)


def multiband_ev_score(
    prediction: np.ndarray,
    target: np.ndarray,
    spacing=None,
    band_edges: list[float] | None = None,
    filter_order: int = 2,
    apodization: str = "tukey",
    noise_corrected: bool = True,
) -> tuple[float, dict]:
    """Multi-band explainable-variance score (reference ``multiband_ev_score``).

    Butterworth band-pass decomposition into radial bands; per-band noise
    sigma^2 via trimmed MAD (highest band anchors the lowest); a single
    affine gain ``a`` fit on the two lowest bands; per-band score =
    noise-corrected EV fraction (or band PCC when
    ``noise_corrected=False``); aggregate = EV-weighted mean.
    Returns ``(score, details)`` with per-band diagnostics.
    """
    spacing = _normalize_spacing(spacing, target.ndim)
    k_nyq = min(1.0 / (2.0 * s) for s in spacing)
    if band_edges is None:
        band_edges = [0.0, 0.3, 0.7, 1.2]
    edges = [e for e in band_edges if e < k_nyq] + [k_nyq]
    n_bands = len(edges) - 1

    apo = _APODIZATION_FNS[apodization]
    pred = apo(prediction.astype(np.float32) - float(np.mean(prediction)))
    targ = apo(target.astype(np.float32) - float(np.mean(target)))
    F_pred = np.fft.fftn(pred)
    F_targ = np.fft.fftn(targ)
    F_pred.ravel()[0] = 0.0
    F_targ.ravel()[0] = 0.0

    k_rad = radial_frequencies(target.shape, spacing)

    bp_pred, bp_targ = [], []
    for j in range(n_bands):
        k_lo, k_hi = edges[j], edges[j + 1]
        H = _butterworth_lp(k_rad, k_hi, filter_order)
        if k_lo > 0:
            H = H - _butterworth_lp(k_rad, k_lo, filter_order)
        bp_pred.append(np.real(np.fft.ifftn(F_pred * H)).astype(np.float32))
        bp_targ.append(np.real(np.fft.ifftn(F_targ * H)).astype(np.float32))

    sigma2 = np.zeros(n_bands)
    n_keep = np.zeros(n_bands, dtype=int)
    sigma2[-1], n_keep[-1] = trimmed_mad_sigma2(bp_targ[-1])
    for j in range(1, n_bands - 1):
        sigma2[j], n_keep[j] = trimmed_mad_sigma2(bp_targ[j])
    # lowest band: structure dominates, MAD unreliable — anchor on the top band
    sigma2[0] = sigma2[-1]
    n_keep[0] = n_keep[-1]

    # single affine gain fit on the low bands
    n_fit = min(2, n_bands)
    x_fit = np.concatenate([bp_pred[j].ravel() for j in range(n_fit)])
    y_fit = np.concatenate([bp_targ[j].ravel() for j in range(n_fit)])
    x_fit = x_fit - x_fit.mean()
    y_fit = y_fit - y_fit.mean()
    xx = float(np.dot(x_fit, x_fit))
    a = max(float(np.dot(x_fit, y_fit)) / xx, 0.0) if xx > 1e-30 else 1.0

    details: dict = {}
    ev_values = np.zeros(n_bands)
    scores = np.zeros(n_bands)
    for j in range(n_bands):
        v_j = float(np.var(bp_targ[j]))
        ev_j = max(v_j - sigma2[j], 0.0)
        ev_values[j] = ev_j
        if ev_j > 0:
            if noise_corrected:
                residual = bp_targ[j] - a * bp_pred[j]
                m_j = float(np.mean(residual**2))
                err_j = max(m_j - sigma2[j], 0.0)
                s_j = float(np.clip(1.0 - err_j / ev_j, -1.0, 1.0))
            else:
                t_c = bp_targ[j].ravel() - bp_targ[j].mean()
                p_c = bp_pred[j].ravel() - bp_pred[j].mean()
                denom = np.sqrt(float(np.dot(t_c, t_c)) * float(np.dot(p_c, p_c)))
                s_j = float(np.dot(t_c, p_c)) / denom if denom > 1e-12 else 0.0
        else:
            s_j = 0.0
        scores[j] = s_j
        details[f"B{j}_{edges[j]:.1f}-{edges[j + 1]:.1f}"] = {
            "EV": ev_j,
            "score": s_j,
            "sigma2": float(sigma2[j]),
            "var": v_j,
            "n_keep": int(n_keep[j]),
        }

    ev_total = float(ev_values.sum())
    score = float(np.sum(ev_values * scores) / ev_total) if ev_total > 0 else 0.0
    details["a"] = a
    details["EV_total"] = ev_total
    return score, details


# -- FSC resolution ------------------------------------------------------------
def _fsc_curve_resolution(
    F_t: np.ndarray,
    F_p: np.ndarray,
    bid: np.ndarray,
    edges: np.ndarray,
    sel: np.ndarray | None,
    threshold: float,
) -> float:
    """Threshold-crossing resolution of one FSC curve.

    ``sel`` optionally restricts the voxels used (sectioned/conical FSC);
    bins left empty by the cone are skipped, not treated as crossings.
    """
    nbins = len(edges) - 1
    flat_bid = bid.ravel()
    valid = flat_bid >= 0
    if sel is not None:
        valid &= sel.ravel()
    b = flat_bid[valid]
    ft = F_t.ravel()[valid]
    fp = F_p.ravel()[valid]
    num = np.bincount(b, weights=np.real(ft * np.conj(fp)), minlength=nbins)
    dt = np.bincount(b, weights=np.abs(ft) ** 2, minlength=nbins)
    dp = np.bincount(b, weights=np.abs(fp) ** 2, minlength=nbins)
    counts = np.bincount(b, minlength=nbins)
    denom = np.sqrt(dt * dp)
    fsc = np.divide(num, denom, out=np.zeros(nbins), where=denom > 1e-30)
    radii = (edges[:-1] + edges[1:]) / 2.0
    populated = counts > 0
    below = np.flatnonzero((fsc < threshold) & (radii > 0) & populated)
    if below.size == 0:
        pop_radii = radii[populated]
        return 1.0 / float(pop_radii[-1]) if pop_radii.size else float("inf")
    k_cut = float(radii[below[0]])
    return 1.0 / k_cut if k_cut > 0 else float("inf")


def _checkerboard_split(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two statistically independent sub-images by 2x2(x2) decimation along
    the last two axes (one-image FSC/FRC, Koho et al. 2019)."""
    sl_even = [slice(None)] * img.ndim
    sl_odd = [slice(None)] * img.ndim
    for ax in (img.ndim - 2, img.ndim - 1):
        n2 = (img.shape[ax] // 2) * 2
        sl_even[ax] = slice(0, n2, 2)
        sl_odd[ax] = slice(1, n2, 2)
    return img[tuple(sl_even)], img[tuple(sl_odd)]


def fsc_resolution(
    target: np.ndarray,
    prediction: np.ndarray | None = None,
    spacing=None,
    *,
    threshold: float = 1.0 / 7.0,
    bin_delta: float = 1.0,
    apodization: str = "tukey",
    cone_half_angle: float = 45.0,
) -> dict[str, float]:
    """Fourier shell/ring correlation resolution.

    FSC per radial bin = Re(sum F_t conj(F_p)) / sqrt(sum|F_t|^2 sum|F_p|^2);
    resolution = 1 / (first frequency where FSC drops below ``threshold``)
    (1/7 criterion). Inputs are mean-centered + apodized like the reference
    (``cubic.metrics.fsc_resolution`` mean-centers internally).

    Single-image mode (``prediction=None``, reference ``evaluate.py:576``
    calls ``fsc_resolution(gt_filled, spacing=...)`` for GT self-resolution):
    splits the image into two independent sub-images by in-plane
    checkerboard decimation, correlates the halves — each retains the
    full field of view at twice the pixel pitch, so sub-image frequencies
    map one-to-one onto the low half of the original band.

    Returns ``{"fsc": resolution}`` (isotropic shell) plus, for 3D
    volumes, ``{"xy", "z"}`` sectioned resolutions from cones within
    ``cone_half_angle`` degrees of the lateral plane / axial axis
    (anisotropic optics report different lateral vs axial cutoffs;
    reference consumes ``fsc["xy"]`` / ``fsc["z"]``, ``evaluate.py:572-578``).
    All values are in physical units; inf when never crossing.
    """
    spacing = _normalize_spacing(spacing, target.ndim)
    apo = _APODIZATION_FNS[apodization]
    if prediction is None:
        t_img, p_img = _checkerboard_split(target.astype(np.float32))
        spacing = list(spacing)
        spacing[-1] *= 2.0
        spacing[-2] *= 2.0
    else:
        t_img, p_img = target, prediction
    t = apo(t_img.astype(np.float32) - float(np.mean(t_img)))
    p = apo(p_img.astype(np.float32) - float(np.mean(p_img)))
    F_t = np.fft.fftn(t)
    F_p = np.fft.fftn(p)
    edges, bid = _radial_bins(t.shape, spacing, bin_delta)

    out = {"fsc": _fsc_curve_resolution(F_t, F_p, bid, edges, None, threshold)}
    if t.ndim == 3:
        # Sectioned FSC: select voxels by angle between k and the kz axis.
        kz = np.fft.fftfreq(t.shape[0], d=spacing[0]).astype(np.float32)
        kz = kz.reshape(-1, 1, 1) * np.ones(t.shape, np.float32)
        k = radial_frequencies(t.shape, spacing)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos_theta = np.where(k > 0, np.abs(kz) / np.maximum(k, 1e-30), 0.0)
        cos_cone = np.cos(np.deg2rad(cone_half_angle))
        sel_z = cos_theta >= cos_cone  # near the axial axis
        sel_xy = cos_theta <= np.sin(np.deg2rad(cone_half_angle))  # near the plane
        out["xy"] = _fsc_curve_resolution(F_t, F_p, bid, edges, sel_xy, threshold)
        out["z"] = _fsc_curve_resolution(F_t, F_p, bid, edges, sel_z, threshold)
    else:
        out["xy"] = out["fsc"]
    return out
