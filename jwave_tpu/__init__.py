"""jwave_tpu — TPU-native wavelet transform engine.

A from-scratch JAX/XLA/Pallas framework with the full capability set of the
reference library Prophetizo/JWave (pure-Java): FWT/WPT over 1D/2D/3D
arrays, FFT-accelerated MODWT on arbitrary lengths, complex CWT scalograms
(Morlet/Mexican Hat/Paul/DOG/Meyer), DFT/FFT, ancient-Egyptian
decomposition, shifting transform, and coefficient compression — backed by
67 precomputed filter banks and designed TPU-first: batched level-unrolled
convolution kernels, trace-time-constant filters, and device-mesh sharding
(see jwave_tpu.parallel).
"""

__version__ = "0.1.0"

from . import config
from .api import (
    AncientEgyptianDecomposition,
    BasicTransform,
    ContinuousWaveletTransform,
    DiscreteFourierTransform,
    FastFourierTransform,
    FastWaveletTransform,
    MODWTTransform,
    ShiftingWaveletTransform,
    Transform,
    TransformBuilder,
    WaveletPacketTransform,
    WaveletTransform,
)
from .compress import Compressor, CompressorMagnitude, CompressorPeaksAverage
from .denoise import denoise, denoise_2d, hard_threshold, mad_sigma, soft_threshold
from .datatypes import (
    Block,
    BlockFull,
    BlockHash,
    Line,
    LineFull,
    LineHash,
    Space,
    SpaceFull,
    SpaceHash,
    complex_to_interleaved,
    interleaved_to_complex,
)
from .variants import (
    EfficientMODWTTransform,
    InPlaceFastWaveletTransform,
    ParallelDiscreteFourierTransform,
    ParallelTransform,
    ParallelWaveletPacketTransform,
    PooledFastFourierTransform,
    PooledMODWTTransform,
    PooledWaveletPacketTransform,
)
from .cwavelets import (
    DOGWavelet,
    MexicanHatWavelet,
    MeyerWavelet,
    MorseWavelet,
    MorletWavelet,
    PaulWavelet,
    get_continuous_wavelet,
)
from .exceptions import (
    JWaveError,
    JWaveException,
    JWaveFailure,
    JWaveNotAllocated,
    JWaveNotFound,
    JWaveNotImplemented,
    JWaveNotKnown,
    JWaveNotValid,
)
from .filters import FilterBank, available_filters, get_filter, junit_passing_filters
from .transforms import (
    BestBasis,
    CWTResult,
    ConvolutionMethod,
    PaddingType,
    aed_forward,
    aed_reverse,
    cwt,
    cwt_chunked,
    cwt_direct,
    icwt,
    fft,
    fwt,
    fwt_decompose,
    fwt_max_level,
    fwt_merge,
    fwt_recompose,
    fwt_split,
    generate_linear_scales,
    generate_log_scales,
    ifft,
    ifwt,
    imodwt,
    imodwt_1d,
    imodwt_2d,
    iwpt,
    modwt,
    modwt_mra,
    modwt_mra_2d,
    modwt_variance,
    modwt_variance_ci,
    modwt_covariance,
    modwt_correlation,
    wavelet_log_spectrum,
    hurst_exponent,
    modwt_1d,
    modwt_2d,
    shifting_forward,
    shifting_reverse,
    wavelet_coherence,
    xwt,
    ssq_cwt,
    issq_cwt,
    SSQResult,
    scattering1d,
    scattering_filter_bank,
    ScatteringResult,
    scattering2d,
    scattering_filter_bank_2d,
    Scattering2DResult,
    extract_ridge,
    ridge_tube_mask,
    best_basis,
    best_basis_reconstruct,
    wpt,
)

__all__ = [
    "config",
    "Transform", "TransformBuilder", "BasicTransform", "WaveletTransform",
    "FastWaveletTransform", "WaveletPacketTransform", "ShiftingWaveletTransform",
    "MODWTTransform", "DiscreteFourierTransform", "FastFourierTransform",
    "AncientEgyptianDecomposition", "ContinuousWaveletTransform",
    "Compressor", "CompressorMagnitude", "CompressorPeaksAverage",
    "denoise", "denoise_2d", "soft_threshold", "hard_threshold", "mad_sigma",
    "MorletWavelet", "MexicanHatWavelet", "PaulWavelet", "DOGWavelet",
    "MeyerWavelet", "MorseWavelet", "get_continuous_wavelet",
    "FilterBank", "get_filter", "available_filters", "junit_passing_filters",
    "fwt", "ifwt", "fwt_max_level", "fwt_decompose", "fwt_recompose", "fwt_split", "fwt_merge",
    "wpt", "iwpt", "BestBasis", "best_basis", "best_basis_reconstruct",
    "modwt", "imodwt", "modwt_1d", "imodwt_1d", "modwt_2d", "imodwt_2d",
    "modwt_mra", "modwt_mra_2d", "modwt_variance", "modwt_variance_ci",
    "modwt_covariance", "modwt_correlation", "wavelet_log_spectrum", "hurst_exponent",
    "ConvolutionMethod", "cwt", "cwt_chunked", "cwt_direct", "icwt", "xwt",
    "wavelet_coherence", "CWTResult", "PaddingType",
    "ssq_cwt", "issq_cwt", "SSQResult", "extract_ridge", "ridge_tube_mask",
    "scattering1d", "scattering_filter_bank", "ScatteringResult",
    "scattering2d", "scattering_filter_bank_2d", "Scattering2DResult",
    "generate_log_scales", "generate_linear_scales",
    "fft", "ifft", "aed_forward", "aed_reverse",
    "shifting_forward", "shifting_reverse",
    "Line", "LineFull", "LineHash", "Block", "BlockFull", "BlockHash",
    "Space", "SpaceFull", "SpaceHash", "complex_to_interleaved", "interleaved_to_complex",
    "InPlaceFastWaveletTransform", "PooledWaveletPacketTransform",
    "PooledFastFourierTransform", "PooledMODWTTransform", "EfficientMODWTTransform",
    "ParallelWaveletPacketTransform", "ParallelDiscreteFourierTransform", "ParallelTransform",
    "JWaveException", "JWaveError", "JWaveFailure", "JWaveNotAllocated",
    "JWaveNotFound", "JWaveNotImplemented", "JWaveNotKnown", "JWaveNotValid",
]
