"""Resolution + band-limited metrics: DCR decorrelation, single-image FRC,
OTF cutoff, Butterworth low-pass, band-limited PCC/SSIM, masked PSNR/SSIM.

Pure-numpy/scipy rebuild of the ``cubic`` primitives consumed by the
reference's spectral-PCC evaluation suite
(``applications/dynacell/src/dynacell/evaluation/spectral_pcc/evaluate.py:24-66``):
``dcr_resolution`` / ``dcr_curve`` (image decorrelation analysis, Descloux
et al., Nat. Methods 2019), ``calculate_frc`` / ``frc_weights`` (one-image
Fourier ring correlation, Koho et al., Nat. Commun. 2019),
``otf_cutoff``, ``estimate_cutoff``, ``_apply_lowpass``,
``band_limited_pcc`` / ``band_limited_ssim`` and the masked
``skimage_metrics.psnr`` / ``ssim`` wrappers.  These run on the host over
full volumes (one FOV/timepoint at a time) — plain FFT + radial binning,
no device library required.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from viscy_tpu.apps.dynacell.eval.spectral import (
    _APODIZATION_FNS,
    _normalize_spacing,
    _radial_bins,
    radial_frequencies,
)

__all__ = [
    "otf_cutoff",
    "apply_lowpass",
    "psnr",
    "ssim",
    "dcr_curve",
    "dcr_resolution",
    "calculate_frc",
    "frc_weights",
    "spectral_pcc_frcw",
    "estimate_cutoff",
    "band_limited_pcc",
    "band_limited_ssim",
]


# -- optics --------------------------------------------------------------------
def otf_cutoff(
    numerical_aperture: float,
    wavelength_emission: float,
    modality: str = "widefield",
) -> float:
    """Incoherent OTF lateral cutoff frequency in cycles / physical unit.

    Widefield fluorescence detection passes frequencies up to
    ``2 NA / lambda_em``; an ideal (closed-pinhole) confocal doubles that.
    Mirrors ``cubic.metrics.bandlimited.otf_cutoff`` as called from the
    reference ``evaluate.py:586-591``.
    """
    base = 2.0 * numerical_aperture / wavelength_emission
    if modality == "widefield":
        return base
    if modality == "confocal":
        return 2.0 * base
    raise ValueError(f"Unknown modality: {modality!r}")


# -- Butterworth low-pass --------------------------------------------------------
def apply_lowpass(
    image: np.ndarray,
    cutoff: float,
    spacing=None,
    order: int = 2,
) -> np.ndarray:
    """Butterworth amplitude low-pass in the Fourier domain.

    ``H(k) = 1 / sqrt(1 + (k / k_c)^(2 order))`` on the isotropic radial
    physical frequency (reference ``_apply_lowpass``).
    """
    spacing = _normalize_spacing(spacing, image.ndim)
    k = radial_frequencies(image.shape, spacing)
    h = 1.0 / np.sqrt(1.0 + (k / max(cutoff, 1e-30)) ** (2 * order))
    out = np.fft.ifftn(np.fft.fftn(image.astype(np.float32)) * h)
    return np.real(out).astype(np.float32)


# -- pixel metrics (masked) ------------------------------------------------------
def psnr(
    image_true: np.ndarray,
    image_test: np.ndarray,
    data_range: float | None = None,
    mask: np.ndarray | None = None,
) -> float:
    """Peak signal-to-noise ratio with optional boolean foreground mask
    (reference ``evaluate.py:83-85`` / ``cubic skimage_metrics.psnr``)."""
    t = image_true.astype(np.float64)
    p = image_test.astype(np.float64)
    if mask is not None:
        t = t[mask]
        p = p[mask]
    if data_range is None:
        data_range = float(t.max() - t.min())
    mse = float(np.mean((t - p) ** 2))
    if mse <= 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def ssim(
    im1: np.ndarray,
    im2: np.ndarray,
    data_range: float | None = None,
    win_size: int = 7,
) -> float:
    """Mean structural similarity (Wang et al. 2004, uniform window).

    Matches skimage's default protocol (win_size=7 uniform filter,
    K1=0.01, K2=0.03, sample covariance correction) so the reference's
    ``ssim`` call (``evaluate.py:88-90``) has a native equivalent; works
    for 2D and 3D inputs.
    """
    x = im1.astype(np.float64)
    y = im2.astype(np.float64)
    if data_range is None:
        data_range = float(x.max() - x.min())
    if data_range <= 0:
        return 1.0
    win_size = min(win_size, *(s for s in x.shape))
    if win_size % 2 == 0:
        win_size -= 1
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    filt = lambda a: ndimage.uniform_filter(a, size=win_size)  # noqa: E731
    np_ = float(win_size) ** x.ndim
    cov_norm = np_ / (np_ - 1.0)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win_size - 1) // 2
    crop = tuple(slice(pad, dim - pad) for dim in s.shape)
    return float(s[crop].mean())


# -- DCR: image decorrelation analysis -------------------------------------------
def _dcr_single_curve(
    fk: np.ndarray,
    fk_norm: np.ndarray,
    r_map: np.ndarray,
    radii: np.ndarray,
) -> np.ndarray:
    """Decorrelation curve d(r) for one (possibly high-passed) spectrum.

    ``d(r) = sum_{|k|<=r} |F(k)| / sqrt(sum |F|^2 * N_{|k|<=r})`` — the
    cosine similarity between the spectrum and its phase-only (unit
    magnitude) copy masked to radius ``r`` (Descloux et al. 2019 eq. 1,
    evaluated with cumulative sums over radius-sorted frequencies).
    """
    mag = np.abs(fk).ravel()
    mask_norm2 = (np.abs(fk_norm) ** 2).ravel()
    order = np.argsort(r_map.ravel())
    r_sorted = r_map.ravel()[order]
    cum_mag = np.cumsum(mag[order] * np.sqrt(mask_norm2[order]))
    cum_n = np.cumsum(mask_norm2[order])
    total_e = float(np.sum(mag**2))
    idx = np.searchsorted(r_sorted, radii, side="right") - 1
    d = np.zeros_like(radii)
    ok = idx >= 0
    denom = np.sqrt(total_e * np.maximum(cum_n[idx[ok]], 1e-30))
    d[ok] = cum_mag[idx[ok]] / denom
    return d


def _find_peak(radii: np.ndarray, d: np.ndarray, min_amplitude: float = 0.0) -> tuple[float, float]:
    """Highest-amplitude interior local maximum of a decorrelation curve.

    Returns (r0, A0); (0, 0) when the curve has no local max above
    ``min_amplitude`` (pure noise or monotone curves).
    """
    if len(d) < 3:
        return 0.0, 0.0
    interior = np.flatnonzero((d[1:-1] >= d[:-2]) & (d[1:-1] >= d[2:])) + 1
    interior = interior[d[interior] > min_amplitude]
    if interior.size == 0:
        return 0.0, 0.0
    # Descloux et al. pick the peak after removing the trailing decay:
    # among local maxima, take the one with the largest amplitude.
    best = interior[np.argmax(d[interior])]
    return float(radii[best]), float(d[best])


def dcr_curve(
    image: np.ndarray,
    spacing=None,
    *,
    num_radii: int = 100,
    num_highpass: int = 10,
    windowing: bool = True,
    refine: bool = True,
    min_amplitude: float = 0.001,
):
    """Image decorrelation analysis on a 2D image.

    Implements Descloux et al. (Nat. Methods 2019): the decorrelation
    curve of the raw spectrum plus ``num_highpass`` Gaussian high-pass
    variants; the resolution estimate is the highest peak frequency over
    all curves.  Mirrors ``cubic.metrics.spectral.dcr.dcr_curve`` as used
    by the reference (``evaluate.py:293-305``).

    Returns
    -------
    (resolution, radii, curves, all_peaks)
        ``resolution``: physical-unit resolution (2 * pixel / r_max, inf
        when no peak); ``radii``: normalized frequencies in [0, 1];
        ``curves``: (num_highpass + 1, num_radii) decorrelation curves;
        ``all_peaks``: (num_highpass + 1, 2) array of (r0, A0) per curve,
        unfiltered curve first.
    """
    if image.ndim != 2:
        raise ValueError(f"dcr_curve expects a 2D image, got shape {image.shape}")
    spacing = _normalize_spacing(spacing, 2)
    img = image.astype(np.float32) - float(np.mean(image))
    if windowing:
        img = _APODIZATION_FNS["tukey"](img)

    fk = np.fft.fftn(img)
    mag = np.abs(fk)
    with np.errstate(invalid="ignore", divide="ignore"):
        fk_norm = np.where(mag > 0, fk / np.maximum(mag, 1e-30), 0.0)

    # Normalized radial frequency in [0, 1]: 1 = the inscribed Nyquist.
    k_phys = radial_frequencies(image.shape, spacing)
    k_nyq = min(0.5 / s for s in spacing)
    r_map = k_phys / k_nyq
    # Mask out the corners beyond the inscribed circle (standard DCR domain).
    inside = r_map <= 1.0
    fk = np.where(inside, fk, 0.0)
    fk_norm = np.where(inside, fk_norm, 0.0)

    radii = np.linspace(1.0 / num_radii, 1.0, num_radii)
    sigmas = np.geomspace(0.15, 1.0, num_highpass) if num_highpass > 0 else []

    curves = np.zeros((1 + len(sigmas), num_radii))
    peaks = np.zeros((1 + len(sigmas), 2))
    curves[0] = _dcr_single_curve(fk, fk_norm, r_map, radii)
    r0, a0 = _find_peak(radii, curves[0], min_amplitude)
    peaks[0] = (r0, a0)

    for i, sig in enumerate(sigmas):
        hp = 1.0 - np.exp(-(r_map**2) / (2.0 * sig**2))
        curves[i + 1] = _dcr_single_curve(fk * hp, fk_norm * hp, r_map, radii)
        r0, a0 = _find_peak(radii, curves[i + 1], min_amplitude)
        peaks[i + 1] = (r0, a0)

    valid = peaks[:, 1] > min_amplitude
    if not valid.any():
        return float("inf"), radii, curves, peaks
    r_max = float(peaks[valid, 0].max())

    if refine and len(sigmas) > 0:
        # Second pass: finer high-pass sweep bracketing the best sigma.
        best_i = int(np.argmax(np.where(valid, peaks[:, 0], -1.0)))
        if best_i > 0:
            s_best = sigmas[best_i - 1]
            for sig in np.geomspace(s_best * 0.6, s_best * 1.6, 5):
                hp = 1.0 - np.exp(-(r_map**2) / (2.0 * sig**2))
                d = _dcr_single_curve(fk * hp, fk_norm * hp, r_map, radii)
                r0, a0 = _find_peak(radii, d, min_amplitude)
                if a0 > min_amplitude:
                    r_max = max(r_max, r0)

    if r_max <= 0:
        return float("inf"), radii, curves, peaks
    # r_max is normalized to the Nyquist; resolution = 1 / (r_max * k_nyq)
    # = 2 * pixel / r_max for isotropic spacing.
    resolution = 1.0 / (r_max * k_nyq)
    return resolution, radii, curves, peaks


def dcr_resolution(image: np.ndarray, spacing=None, **kwargs):
    """DCR resolution estimate.

    2D input -> float resolution in physical units. 3D input -> a
    ``{"xy", "z"}`` dict like the reference call sites expect
    (``evaluate.py:580-582``): lateral from the mid-Z YX slice, axial
    from the mid-X ZY slice (anisotropic spacing respected).
    """
    spacing = _normalize_spacing(spacing, image.ndim)
    kwargs = {
        k: v
        for k, v in kwargs.items()
        if k in ("num_radii", "num_highpass", "windowing", "refine", "min_amplitude")
    }
    if image.ndim == 2:
        res, _, _, _ = dcr_curve(image, spacing, **kwargs)
        return res
    if image.ndim != 3:
        raise ValueError(f"dcr_resolution expects 2D or 3D, got shape {image.shape}")
    mid_z = image.shape[0] // 2
    mid_x = image.shape[2] // 2
    res_xy, _, _, _ = dcr_curve(image[mid_z], spacing[1:], **kwargs)
    res_z, _, _, _ = dcr_curve(image[:, :, mid_x], [spacing[0], spacing[1]], **kwargs)
    return {"xy": res_xy, "z": res_z}


# -- FRC: (one-image) Fourier ring correlation ------------------------------------
def _frc_two_image(
    a: np.ndarray,
    b: np.ndarray,
    bin_delta: float = 1.0,
    disable_hamming: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """FRC curve between two images: per-radial-bin normalized cross power.

    Returns (frequency_normalized, correlation) with frequency in [0, 1]
    of the images' Nyquist. Index-unit radial bins (spacing=None) so the
    bin layout matches ``radial_power_spectrum(..., spacing=None)``.
    """
    if not disable_hamming:
        for axis, n in enumerate(a.shape):
            w = np.hamming(n).astype(np.float32)
            shape = [1] * a.ndim
            shape[axis] = n
            a = a * w.reshape(shape)
            b = b * w.reshape(shape)
    fa = np.fft.fftn(a)
    fb = np.fft.fftn(b)
    spacing = _normalize_spacing(None, a.ndim)
    edges, bid = _radial_bins(a.shape, spacing, bin_delta)
    nbins = len(edges) - 1
    flat = bid.ravel()
    valid = flat >= 0
    bsel = flat[valid]
    cross = np.real(fa.ravel()[valid] * np.conj(fb.ravel()[valid]))
    pa = np.abs(fa.ravel()[valid]) ** 2
    pb = np.abs(fb.ravel()[valid]) ** 2
    num = np.bincount(bsel, weights=cross, minlength=nbins)
    da = np.bincount(bsel, weights=pa, minlength=nbins)
    db = np.bincount(bsel, weights=pb, minlength=nbins)
    denom = np.sqrt(da * db)
    frc = np.divide(num, denom, out=np.zeros(nbins), where=denom > 1e-30)
    centers = (edges[:-1] + edges[1:]) / 2.0
    k_nyq = min(0.5 / s for s in spacing)
    return centers / k_nyq, frc


def calculate_frc(
    image: np.ndarray,
    image2: np.ndarray | None = None,
    *,
    bin_delta: float = 1.0,
    disable_hamming: bool = False,
    average: bool = True,
    **_ignored,
) -> dict:
    """Fourier ring correlation; one-image mode via checkerboard split.

    With ``image2=None``, splits the image into two statistically
    independent sub-images by 2x2 pixel decimation (Koho et al., Nat.
    Commun. 2019) — diagonal pair (even/even vs odd/odd), averaged with
    the anti-diagonal pair when ``average``. Mirrors the call shape of
    ``cubic.metrics.spectral.frc.calculate_frc`` used by the reference
    bead diagnostics (``simulate_beads.py:1085-1094``).

    Returns ``{"correlation": {"frequency": ..., "correlation": ...}}``.
    """
    img = image.astype(np.float32) - float(np.mean(image))
    if image2 is not None:
        img2 = image2.astype(np.float32) - float(np.mean(image2))
        freq, corr = _frc_two_image(img, img2, bin_delta, disable_hamming)
        return {"correlation": {"frequency": freq, "correlation": corr}}
    if img.ndim != 2:
        raise ValueError("one-image FRC requires a 2D image")
    h2, w2 = (img.shape[0] // 2) * 2, (img.shape[1] // 2) * 2
    img = img[:h2, :w2]
    s_ee = img[0::2, 0::2]
    s_oo = img[1::2, 1::2]
    freq, corr = _frc_two_image(s_ee, s_oo, bin_delta, disable_hamming)
    if average:
        s_eo = img[0::2, 1::2]
        s_oe = img[1::2, 0::2]
        _, corr2 = _frc_two_image(s_eo, s_oe, bin_delta, disable_hamming)
        corr = 0.5 * (corr + corr2)
    return {"correlation": {"frequency": freq, "correlation": corr}}


def frc_weights(image: np.ndarray, bin_delta: float = 1.0) -> np.ndarray:
    """Per-radial-bin weights from the one-image FRC curve, clipped to
    [0, 1] (reference ``cubic.metrics.bandlimited.frc_weights``; consumed
    by the frozen-FRCW protocol in ``evaluate.py:1107-1133``)."""
    result = calculate_frc(image, bin_delta=bin_delta)
    corr = result["correlation"]["correlation"]
    return np.clip(corr, 0.0, 1.0).astype(np.float32)


def spectral_pcc_frcw(
    prediction: np.ndarray,
    target: np.ndarray,
    spacing=None,
    *,
    bin_delta: float = 1.0,
    apodization: str = "tukey",
    frozen_weights: np.ndarray | None = None,
) -> float:
    """Spectral PCC with FRC-curve weights (FRCW variant).

    Per-bin weights come from the target's one-image FRC (its SNR
    signature) — or ``frozen_weights`` pre-computed from an early-window
    median (reference ``evaluate.py:891-904``). The FRC is computed on
    half-resolution sub-images, so its bins cover the low half of the
    full image's radial bins; remaining bins get zero weight.
    """
    if prediction.shape != target.shape:
        raise ValueError(f"shape mismatch {prediction.shape} vs {target.shape}")
    spacing = _normalize_spacing(spacing, target.ndim)
    apo = _APODIZATION_FNS[apodization]
    pred = apo(prediction.astype(np.float32) - float(np.mean(prediction)))
    targ = apo(target.astype(np.float32) - float(np.mean(target)))
    f_pred = np.fft.fftn(pred)
    f_targ = np.fft.fftn(targ)

    w_frc = frozen_weights if frozen_weights is not None else frc_weights(target, bin_delta=bin_delta)

    _, bid = _radial_bins(target.shape, spacing, bin_delta)
    nbins = int(bid.max()) + 1
    w_bins = np.zeros(nbins, np.float32)
    n = min(nbins, len(w_frc))
    w_bins[:n] = w_frc[:n]
    if float(w_bins.max(initial=0.0)) == 0.0:
        return 0.0

    flat = bid.ravel()
    valid = flat >= 0
    w_full = np.zeros(flat.shape, np.float32)
    w_full[valid] = w_bins[flat[valid]]
    cross = np.real(f_pred.ravel() * np.conj(f_targ.ravel()))
    num = float(np.sum(w_full * cross))
    denom = np.sqrt(
        float(np.sum(w_full * np.abs(f_pred.ravel()) ** 2))
        * float(np.sum(w_full * np.abs(f_targ.ravel()) ** 2))
    )
    if denom < 1e-12:
        return 0.0
    return float(np.clip(num / denom, -1.0, 1.0))


# -- cutoff estimation + band-limited metrics --------------------------------------
def estimate_cutoff(
    image: np.ndarray,
    spacing=None,
    *,
    method: str = "dcr",
    numerical_aperture: float | None = None,
    wavelength_emission: float | None = None,
    dcr_kwargs: dict | None = None,
    frc_kwargs: dict | None = None,
    frc_threshold: float = 1.0 / 7.0,
) -> float:
    """Estimate a low-pass cutoff frequency from an image.

    Methods: ``dcr`` (decorrelation resolution), ``frc`` (one-image FRC
    1/7 crossing), ``otf`` (analytic optics bound).  Mirrors
    ``cubic.metrics.bandlimited.estimate_cutoff`` as swept by the bead
    diagnostics (``simulate_beads.py:476-495``).
    """
    spacing = _normalize_spacing(spacing, image.ndim)
    if method == "otf":
        if numerical_aperture is None or wavelength_emission is None:
            raise ValueError("otf method requires numerical_aperture and wavelength_emission")
        return otf_cutoff(numerical_aperture, wavelength_emission)
    if method == "dcr":
        res = dcr_resolution(image, spacing, **(dcr_kwargs or {}))
        if isinstance(res, dict):
            res = res["xy"]
        if not np.isfinite(res) or res <= 0:
            raise ValueError("DCR found no resolution peak")
        return 1.0 / res
    if method == "frc":
        result = calculate_frc(image, **(frc_kwargs or {}))
        freq = result["correlation"]["frequency"]
        corr = result["correlation"]["correlation"]
        below = np.flatnonzero((corr < frc_threshold) & (freq > 0))
        # One-image FRC runs on 2x-decimated sub-images: their Nyquist is
        # half the full image's, so normalized sub-image frequency maps to
        # physical frequency through k_nyq / 2.
        k_nyq_sub = min(0.5 / s for s in spacing) / 2.0
        if below.size == 0:
            return float(freq[-1]) * k_nyq_sub
        return float(freq[below[0]]) * k_nyq_sub
    raise ValueError(f"Unknown cutoff method: {method!r}")


def band_limited_pcc(
    prediction: np.ndarray,
    target: np.ndarray,
    spacing=None,
    *,
    cutoff: float,
    order: int = 2,
    **_ignored,
) -> float:
    """Pearson correlation after Butterworth low-pass at ``cutoff``
    (reference ``cubic.metrics.bandlimited.band_limited_pcc``, consumed
    with DCR/FSC/OTF cutoffs in ``evaluate.py:698-821``)."""
    spacing = _normalize_spacing(spacing, target.ndim)
    p = apply_lowpass(prediction, cutoff, spacing, order)
    t = apply_lowpass(target, cutoff, spacing, order)
    pc = p.ravel() - p.mean()
    tc = t.ravel() - t.mean()
    denom = np.sqrt(float(np.dot(pc, pc)) * float(np.dot(tc, tc)))
    if denom < 1e-12:
        return 0.0
    return float(np.clip(float(np.dot(pc, tc)) / denom, -1.0, 1.0))


def band_limited_ssim(
    prediction: np.ndarray,
    target: np.ndarray,
    spacing=None,
    *,
    cutoff: float,
    order: int = 2,
    win_size: int = 7,
    data_range: float | None = None,
    **_ignored,
) -> float:
    """SSIM after Butterworth low-pass at ``cutoff`` (reference
    ``band_limited_ssim``; ``win_size`` / ``data_range`` forwarded like
    the reference's ``ssim_extra`` plumbing, ``evaluate.py:700-704``)."""
    spacing = _normalize_spacing(spacing, target.ndim)
    p = apply_lowpass(prediction, cutoff, spacing, order)
    t = apply_lowpass(target, cutoff, spacing, order)
    if data_range is None:
        data_range = float(t.max() - t.min())
    return ssim(t, p, data_range=data_range, win_size=win_size)
