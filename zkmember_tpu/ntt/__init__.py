from zkmember_tpu.ntt.ntt import Domain, ntt, intt, coset_ntt, coset_intt  # noqa: F401
