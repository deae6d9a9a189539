"""Robot model presets (reference: matlab/+gpmp2/generate*.m, gpmp2_python/robots)."""

from .mobile_presets import MOBILE_PRESETS, generate_mobile_arm, generate_mobile_base
from .presets import ARM_PRESETS, generate_arm

__all__ = ["generate_arm", "ARM_PRESETS", "generate_mobile_arm",
           "generate_mobile_base", "MOBILE_PRESETS"]
