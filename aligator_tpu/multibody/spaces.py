"""Multibody configuration & phase-space manifolds
(reference: modelling/spaces/multibody.hpp:16-131)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aligator_tpu.manifolds.base import Manifold
from aligator_tpu.multibody.model import (
    MultibodyModel,
    joint_integrate,
    joint_difference,
)


@dataclasses.dataclass(frozen=True)
class MultibodyConfiguration(Manifold):
    """Configuration space Q of a kinematic tree (nq coords, nv tangent)."""

    model: MultibodyModel

    # The manifold is static jit metadata: the model's arrays are baked in
    # as compile-time constants. Equality must therefore compare array
    # CONTENTS — topology-only equality would let jit reuse a program
    # compiled for a different model (silent wrong results).
    def __hash__(self):
        import numpy as _np

        digest = hash(
            tuple(
                _np.asarray(a).tobytes()
                for a in (self.model.jplace_p, self.model.mass)
            )
        )
        return hash((self.model.joints, self.model.parents, digest))

    def __eq__(self, other):
        import numpy as _np

        if not isinstance(other, MultibodyConfiguration):
            return False
        if (
            self.model.joints != other.model.joints
            or self.model.parents != other.model.parents
        ):
            return False
        mine = jax.tree.leaves(self.model)
        theirs = jax.tree.leaves(other.model)
        return all(
            _np.array_equal(_np.asarray(a), _np.asarray(b))
            for a, b in zip(mine, theirs)
        )

    @property
    def nx(self) -> int:
        return self.model.nq

    @property
    def ndx(self) -> int:
        return self.model.nv

    def integrate(self, x, v):
        parts = []
        qo = self.model.q_offsets
        vo = self.model.v_offsets
        for i, spec in enumerate(self.model.joints):
            parts.append(
                joint_integrate(
                    spec, x[..., qo[i] : qo[i] + spec.nq], v[..., vo[i] : vo[i] + spec.nv]
                )
            )
        return jnp.concatenate(parts, axis=-1)

    def difference(self, x0, x1):
        parts = []
        qo = self.model.q_offsets
        for i, spec in enumerate(self.model.joints):
            parts.append(
                joint_difference(
                    spec,
                    x0[..., qo[i] : qo[i] + spec.nq],
                    x1[..., qo[i] : qo[i] + spec.nq],
                )
            )
        return jnp.concatenate(parts, axis=-1)

    def neutral(self):
        return self.model.neutral_q()

    def rand(self, key):
        v = 0.5 * jax.random.normal(key, (self.ndx,))
        return self.integrate(self.neutral(), v)

    def normalize(self, x):
        # re-normalize free-flyer quaternions
        parts = []
        qo = self.model.q_offsets
        for i, spec in enumerate(self.model.joints):
            qj = x[..., qo[i] : qo[i] + spec.nq]
            if spec.jtype == "freeflyer":
                quat = qj[..., 3:]
                quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
                qj = jnp.concatenate([qj[..., :3], quat], axis=-1)
            parts.append(qj)
        return jnp.concatenate(parts, axis=-1)


def MultibodyPhaseSpace(model: MultibodyModel):
    """Phase space TQ = (q, v) — the tangent bundle of the configuration
    space (modelling/spaces/multibody.hpp:67-131)."""
    from aligator_tpu.manifolds.tangent import TangentBundle

    return TangentBundle(MultibodyConfiguration(model))


def integrate_configuration(model: MultibodyModel, q, dq):
    """q ⊕ dq on the configuration manifold (free function used by the
    contact layer's drift JVP)."""
    return MultibodyConfiguration(model).integrate(q, dq)
