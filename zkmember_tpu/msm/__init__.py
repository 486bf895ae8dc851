from zkmember_tpu.msm.msm import G1Points, G2Points, msm  # noqa: F401
