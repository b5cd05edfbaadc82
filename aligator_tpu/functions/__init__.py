"""Residual function library (reference: core/function-abstract.hpp +
modelling/). Multibody/centroidal/contact residual families live in the
submodules (frames, contact, centroidal, autodiff) and are re-exported
here for API parity with the reference's flat namespace (SURVEY §9)."""

from aligator_tpu.functions.base import StageFunction, UnaryFunction, tangent_jac_x
from aligator_tpu.functions.basic import (
    StateErrorResidual,
    ControlErrorResidual,
    LinearFunction,
    ControlBoxFunction,
    LinearFunctionComposition,
    FunctionSlice,
)
from aligator_tpu.functions.frames import (
    FramePlacementResidual,
    FrameTranslationResidual,
    FrameVelocityResidual,
    FrameEqualityResidual,
    FlyHighResidual,
    FrameCollisionResidual,
    CenterOfMassTranslationResidual,
    CenterOfMassVelocityResidual,
    DCMPositionResidual,
    CentroidalMomentumResidual,
    CentroidalMomentumDerivativeResidual,
    GravityCompensationResidual,
)
from aligator_tpu.functions.contact import (
    ContactForceResidual,
    MultibodyFrictionConeResidual,
    MultibodyWrenchConeResidual,
    wrench_cone_matrix,
)
from aligator_tpu.functions.centroidal import (
    CentroidalCoMResidual,
    LinearMomentumResidual,
    AngularMomentumResidual,
    CentroidalAccelerationResidual,
    AngularAccelerationResidual,
    CentroidalFrictionConeResidual,
    CentroidalWrenchConeResidual,
    CentroidalWrapperResidual,
)
from aligator_tpu.functions.autodiff import (
    FiniteDifferenceHelper,
    DynamicsFiniteDifferenceHelper,
    CostFiniteDifference,
)

__all__ = [
    "StageFunction", "UnaryFunction", "tangent_jac_x",
    "StateErrorResidual", "ControlErrorResidual", "LinearFunction",
    "ControlBoxFunction", "LinearFunctionComposition", "FunctionSlice",
    "FramePlacementResidual", "FrameTranslationResidual",
    "FrameVelocityResidual", "FrameEqualityResidual", "FlyHighResidual",
    "FrameCollisionResidual", "CenterOfMassTranslationResidual",
    "CenterOfMassVelocityResidual", "DCMPositionResidual",
    "CentroidalMomentumResidual", "CentroidalMomentumDerivativeResidual",
    "GravityCompensationResidual",
    "ContactForceResidual", "MultibodyFrictionConeResidual",
    "MultibodyWrenchConeResidual", "wrench_cone_matrix",
    "CentroidalCoMResidual", "LinearMomentumResidual",
    "AngularMomentumResidual", "CentroidalAccelerationResidual",
    "AngularAccelerationResidual", "CentroidalFrictionConeResidual",
    "CentroidalWrenchConeResidual", "CentroidalWrapperResidual",
    "FiniteDifferenceHelper", "DynamicsFiniteDifferenceHelper",
    "CostFiniteDifference",
]
