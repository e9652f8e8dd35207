"""Transform algorithms (functional, jittable core).

Each transform is a pure function ``f(signal, wavelet/params, level) ->
coeffs`` over the last axis (or last 2/3 axes for separable nD), batched
over all leading axes. Class facades live in :mod:`jwave_tpu.api`.
"""
from .fwt import fwt, fwt2d, ifwt, ifwt2d, fwt_max_level, fwt_decompose, fwt_recompose, fwt_split, fwt_merge
from .wpt import BestBasis, best_basis, best_basis_reconstruct, BestBasis2D, best_basis_2d, best_basis_2d_reconstruct, iwpt, wpt, wpt_interleaved_to_subband, wpt_subband_to_interleaved
from .modwt import modwt, imodwt, modwt_1d, imodwt_1d, modwt_2d, imodwt_2d, modwt_mra, modwt_mra_2d, modwt_variance, modwt_variance_ci, modwt_covariance, modwt_correlation, wavelet_log_spectrum, hurst_exponent, ConvolutionMethod
from .cwt import cwt, cwt_chunked, cwt_direct, icwt, xwt, wavelet_coherence, CWTResult, generate_log_scales, generate_linear_scales, PaddingType
from .ssq import ssq_cwt, issq_cwt, SSQResult, one_integral_constant, extract_ridge, ridge_tube_mask
from .scattering import scattering1d, scattering_filter_bank, ScatteringResult, scattering2d, scattering_filter_bank_2d, Scattering2DResult
from .vmd import vmd, VMDResult
from .pursuit import matching_pursuit, gabor_dictionary, GaborDictionary, MPResult
from .dtcwt import dtcwt, idtcwt, dtcwt2d, idtcwt2d, DTCWTResult, DTCWT2DResult
from .superlet import superlet
from .analytic import analytic_signal, envelope, instantaneous_frequency
from .ewt import ewt, iewt, ewt_boundaries, ewt_filter_bank, EWTResult
from .wvd import wigner_ville
from .lifting import LiftingScheme, get_scheme, lifting_schemes, lifting_dwt, lifting_idwt, lifting_fwt, lifting_ifwt
from .sliding import SlidingMODWT, SlidingState, sliding_modwt_init, sliding_modwt_update
from .fft import bluestein_fft, fft, ifft, dft, idft, fft_interleaved, ifft_interleaved
from .aed import aed_forward, aed_reverse
from .shifting import shifting_forward, shifting_reverse
from .ndim import forward_2d, reverse_2d, forward_3d, reverse_3d, forward_complex, reverse_complex

__all__ = [
    "fwt", "fwt2d", "ifwt", "ifwt2d", "fwt_max_level", "fwt_decompose", "fwt_recompose", "fwt_split", "fwt_merge",
    "wpt", "iwpt", "wpt_interleaved_to_subband", "wpt_subband_to_interleaved",
    "modwt", "imodwt", "modwt_1d", "imodwt_1d", "modwt_2d", "imodwt_2d", "ConvolutionMethod",
    "SlidingMODWT", "SlidingState", "sliding_modwt_init", "sliding_modwt_update",
    "cwt", "cwt_chunked", "cwt_direct", "icwt", "CWTResult", "generate_log_scales", "generate_linear_scales", "PaddingType",
    "scattering1d", "scattering_filter_bank", "ScatteringResult",
    "scattering2d", "scattering_filter_bank_2d", "Scattering2DResult",
    "vmd", "VMDResult",
    "matching_pursuit", "gabor_dictionary", "GaborDictionary", "MPResult",
    "dtcwt", "idtcwt", "dtcwt2d", "idtcwt2d", "DTCWTResult", "DTCWT2DResult",
    "superlet",
    "analytic_signal", "envelope", "instantaneous_frequency",
    "ewt", "iewt", "ewt_boundaries", "ewt_filter_bank", "EWTResult",
    "wigner_ville",
    "LiftingScheme", "get_scheme", "lifting_schemes",
    "lifting_dwt", "lifting_idwt", "lifting_fwt", "lifting_ifwt",
    "fft", "ifft", "dft", "idft", "fft_interleaved", "ifft_interleaved",
    "aed_forward", "aed_reverse",
    "shifting_forward", "shifting_reverse",
    "forward_2d", "reverse_2d", "forward_3d", "reverse_3d", "forward_complex", "reverse_complex",
]
