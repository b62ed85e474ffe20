from . import formats, reference
from .formats import (
    FP4_VALUES, NVFP4_GROUP_SIZE, MXFP4_GROUP_SIZE,
    fp4_decode, fp4_encode, pack_fp4_pairs, unpack_fp4_pairs,
    e4m3_decode, e4m3_encode, e8m0_decode, e8m0_encode,
)
from .reference import (
    dequant_nvfp4, dequant_mxfp4, gemm_reference,
    quantize_nvfp4, quantize_mxfp4,
)
