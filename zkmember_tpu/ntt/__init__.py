from zkmember_tpu.ntt.ntt import (  # noqa: F401
    Domain,
    ntt,
    intt,
    coset_ntt,
    coset_intt,
    _fft_core,
    _fft_core_axis,
)
