"""JAX rigid-body dynamics layer — the TPU-native stand-in for Pinocchio
(the reference's multibody backend; SURVEY §2.4, §8.5)."""

from aligator_tpu.multibody.spatial import (
    SE3T,
    se3_mul,
    se3_inv,
    se3_act_motion,
    se3_act_inv_motion,
    se3_act_force,
    se3_adjoint,
    so3_log,
    se3_log,
    Inertia,
)
from aligator_tpu.multibody.model import (
    JointSpec,
    FrameSpec,
    MultibodyModel,
    build_serial_chain,
    build_quadruped,
    quadruped_standing,
)
from aligator_tpu.multibody.algorithms import (
    forward_kinematics,
    frame_placement,
    frame_velocity,
    frame_jacobian_local,
    rnea,
    nonlinear_effects,
    gravity_torque,
    mass_matrix,
    fwd_dynamics,
    aba,
    com_position,
)
from aligator_tpu.multibody.spaces import (
    MultibodyConfiguration,
    MultibodyPhaseSpace,
)
from aligator_tpu.multibody.contact import (
    ContactSpec,
    ContactSet,
    make_contact_set,
    anchor_at_configuration,
    constrained_dynamics,
    contact_forces,
    contact_slice,
)

__all__ = [
    "SE3T", "se3_mul", "se3_inv", "se3_act_motion", "se3_act_inv_motion",
    "se3_act_force", "se3_adjoint", "so3_log", "se3_log", "Inertia",
    "JointSpec", "FrameSpec", "MultibodyModel", "build_serial_chain",
    "build_quadruped", "quadruped_standing",
    "forward_kinematics", "frame_placement", "frame_velocity",
    "frame_jacobian_local", "rnea", "nonlinear_effects", "gravity_torque",
    "mass_matrix", "fwd_dynamics", "aba", "com_position",
    "MultibodyConfiguration", "MultibodyPhaseSpace",
    "ContactSpec", "ContactSet", "make_contact_set", "anchor_at_configuration",
    "constrained_dynamics", "contact_forces", "contact_slice",
]
