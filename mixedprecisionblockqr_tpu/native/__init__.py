"""Native (C++) runtime components.

The reference's runtime around its kernels is native C++ (loaders, harness,
``Cuda/helper_cuda.h``).  Ours likewise keeps hot host-side paths native:
``euroc_native`` is a ctypes-wrapped C++ parser for the Jacobian text format
(built from ``native/euroc_parser.cpp`` by ``make -C native`` or
``python -m mixedprecisionblockqr_tpu.native.build``); Python fallbacks exist
for every native component.
"""
