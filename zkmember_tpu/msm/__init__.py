from zkmember_tpu.msm import msm as _msm_module  # noqa: F401

# Re-export the public surface WITHOUT shadowing the `msm` submodule name
# (import zkmember_tpu.msm.msm must keep resolving to the module).
G1Points = _msm_module.g1_points_from_host
G2Points = _msm_module.g2_points_from_host
multi_scalar_mul = _msm_module.msm
