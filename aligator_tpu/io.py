"""Problem-spec serialization: build problems from plain dict/JSON specs.

This replaces the reference's Crocoddyl compatibility layer
(compat/crocoddyl/*, SURVEY §2.7): that layer exists to interop with a
CPU library's in-memory objects, which is meaningless on TPU — the
portable equivalent is a declarative problem *specification* that other
front-ends (including a Crocoddyl exporter) can emit. Specs are plain
JSON-able dicts; arrays are nested lists.

Schema (all keys lowercase):
    {"model": MODEL?,            # multibody model, referenced by space/dyn/res
     "space": {"type": "vector", "dim": 3} | {"type": "se2"} | {"type": "se3"}
            | {"type": "multibody_phase"},          # phase space of "model"
     "nu": 2, "nsteps": 20, "x0": [...],
     "dynamics": {"type": "linear_discrete", "A": [[..]], "B": [[..]], "c": [..]}
               | {"type": "integrator", "scheme": "euler|semi_euler|rk2|rk4|midpoint",
                  "dt": 0.01, "ode": ODE},
     "cost": COST, "term_cost": COST,
     "constraints": [{"residual": RES, "set": SET}, ...],
     "term_constraints": [...]}
    MODEL = {"type": "serial_chain", "n_links": 6}
          | {"type": "humanoid"}
          | {"type": "urdf", "path": "robot.urdf", ["free_flyer": false]}
    ODE  = {"type": "linear", "A":.., "B":.., "c":..}
         | {"type": "unicycle"}                      # the se2-car body-frame ODE
         | {"type": "multibody_free_fwd",
            "actuation": "full" | "floating_base"}   # uses "model"
    COST = {"type": "quadratic", "Wx":.., "Wu":.., ["N":..]}
         | {"type": "quad_state", "target":.., "W":..}
         | {"type": "quad_control", "target":.., "W":..}
         | {"type": "quad_residual", "residual": RES, "W":..}
         | {"type": "stack", "components": [[COST, weight], ...]}
    RES  = {"type": "state_error", "target": [..]}
         | {"type": "control_error", "target": [..]}
         | {"type": "linear", "A":.., "B":.., "c":..}
         | {"type": "frame_translation", "frame": "tool0", "ref": [..]}
         | {"type": "frame_placement", "frame": "..", "ref_R": [[..]], "ref_p": [..]}
    SET  = {"type": "equality"} | {"type": "negative_orthant"}
         | {"type": "box", "lower": [..], "upper": [..]}
         | {"type": "l1", "scale": s}
"""

from __future__ import annotations

import json
from typing import Any

import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.problem import TrajOptProblem, build_problem


def _arr(v, dtype):
    return jnp.asarray(v, dtype)


def _model_from_spec(m: dict, dtype):
    """Multibody model specs (referenced by space/dynamics/frame residuals)."""
    from aligator_tpu import multibody as mb

    t = m["type"]
    if t == "serial_chain":
        return mb.build_serial_chain(n_links=int(m["n_links"]), dtype=dtype)
    if t == "humanoid":
        from aligator_tpu.multibody.model import build_humanoid

        return build_humanoid(dtype)
    if t == "urdf":
        from aligator_tpu.multibody.urdf import load_urdf

        return load_urdf(m["path"], free_flyer=bool(m.get("free_flyer", False)),
                         dtype=dtype)
    raise ValueError(f"unknown model type {t!r}")


def _space_from_spec(sp: dict, model=None):
    t = sp["type"]
    if t == "vector":
        return M.VectorSpace(int(sp["dim"]))
    if t == "se2":
        return M.SE2()
    if t == "se3":
        return M.SE3()
    if t == "so2":
        return M.SO2()
    if t == "so3":
        return M.SO3()
    if t == "multibody_phase":
        from aligator_tpu import multibody as mb

        if model is None:
            raise ValueError("multibody_phase space needs a top-level 'model'")
        return mb.MultibodyPhaseSpace(model)
    raise ValueError(f"unknown space type {t!r}")


def _residual_from_spec(r: dict, space, dtype, model=None):
    from aligator_tpu.functions import (
        StateErrorResidual,
        ControlErrorResidual,
        LinearFunction,
    )

    t = r["type"]
    if t == "state_error":
        return StateErrorResidual(target=_arr(r["target"], dtype), space=space)
    if t == "control_error":
        return ControlErrorResidual(target=_arr(r["target"], dtype))
    if t == "linear":
        return LinearFunction(
            A=_arr(r["A"], dtype), B=_arr(r["B"], dtype), c=_arr(r["c"], dtype)
        )
    if t in ("frame_translation", "frame_placement"):
        if model is None:
            raise ValueError(f"{t} residual needs a top-level 'model'")
        fid = model.frame_id(r["frame"])
        if t == "frame_translation":
            from aligator_tpu.functions.frames import FrameTranslationResidual

            return FrameTranslationResidual(
                model=model, ref=_arr(r["ref"], dtype), frame_id=fid
            )
        from aligator_tpu.functions.frames import FramePlacementResidual

        return FramePlacementResidual(
            model=model, ref_R=_arr(r["ref_R"], dtype), ref_p=_arr(r["ref_p"], dtype),
            frame_id=fid,
        )
    raise ValueError(f"unknown residual type {t!r}")


def _set_from_spec(s: dict):
    t = s["type"]
    if t == "equality":
        return S.EqualityConstraint()
    if t == "negative_orthant":
        return S.NegativeOrthant()
    if t == "box":
        return S.BoxConstraint(lower=tuple(s["lower"]), upper=tuple(s["upper"]))
    if t == "l1":
        return S.L1Penalty()
    raise ValueError(f"unknown set type {t!r}")


def _cost_from_spec(c: dict, space, dtype, model=None):
    t = c["type"]
    if t == "quadratic":
        return C.QuadraticCost.create(
            _arr(c["Wx"], dtype), _arr(c["Wu"], dtype),
            N=_arr(c["N"], dtype) if "N" in c else None,
        )
    if t == "quad_state":
        return C.QuadraticStateCost(space, _arr(c["target"], dtype),
                                    _arr(c["W"], dtype))
    if t == "quad_control":
        return C.QuadraticControlCost(_arr(c["target"], dtype), _arr(c["W"], dtype))
    if t == "quad_residual":
        return C.QuadraticResidualCost(
            residual=_residual_from_spec(c["residual"], space, dtype, model),
            W=_arr(c["W"], dtype),
        )
    if t == "stack":
        return C.CostStack.create(
            *[(_cost_from_spec(cc, space, dtype, model), w)
              for cc, w in c["components"]]
        )
    raise ValueError(f"unknown cost type {t!r}")


def _ode_from_spec(ode_spec: dict, dtype, model=None):
    from aligator_tpu.dynamics import LinearODE

    t = ode_spec["type"]
    if t == "linear":
        return LinearODE(A=_arr(ode_spec["A"], dtype),
                         B=_arr(ode_spec["B"], dtype),
                         c=_arr(ode_spec["c"], dtype))
    if t == "unicycle":
        # the se2-car body-frame ODE (examples/se2_car.py CarDynamics;
        # reference examples/se2-car.hpp:34-100)
        from aligator_tpu.functions.custom import CustomODE

        def xdot(space_, x, u):
            v, w = u[..., 0], u[..., 1]
            return jnp.stack([v, jnp.zeros_like(v), w], axis=-1)

        return CustomODE(fn=xdot)
    if t == "multibody_free_fwd":
        from aligator_tpu.dynamics.multibody import (
            MultibodyFreeFwdDynamics,
            floating_base_actuation,
            full_actuation,
        )

        if model is None:
            raise ValueError("multibody_free_fwd ode needs a top-level 'model'")
        act = ode_spec.get("actuation", "full")
        actuation = (full_actuation(model, dtype) if act == "full"
                     else floating_base_actuation(model, dtype))
        return MultibodyFreeFwdDynamics(model=model, actuation=actuation)
    raise ValueError(f"unknown ode type {t!r}")


def _dynamics_from_spec(d: dict, dtype, model=None):
    from aligator_tpu.dynamics import (
        LinearDiscreteDynamics,
        EulerIntegrator,
        SemiImplEulerIntegrator,
        RK2Integrator,
        RK4Integrator,
        MidpointIntegratorExplicit,
    )

    t = d["type"]
    if t == "linear_discrete":
        return LinearDiscreteDynamics(
            A=_arr(d["A"], dtype), B=_arr(d["B"], dtype), c=_arr(d["c"], dtype)
        )
    if t == "integrator":
        ode = _ode_from_spec(d["ode"], dtype, model)
        dt = jnp.asarray(d["dt"], dtype)
        scheme = d.get("scheme", "euler")
        mk = {
            "euler": lambda: EulerIntegrator(ode=ode, dt=dt),
            "semi_euler": lambda: SemiImplEulerIntegrator(ode=ode, dt=dt),
            "rk2": lambda: RK2Integrator(ode=ode, dt=dt),
            "rk4": lambda: RK4Integrator(ode=ode, dt=dt),
            "midpoint": lambda: MidpointIntegratorExplicit(ode, dt),
        }
        return mk[scheme]()
    raise ValueError(f"unknown dynamics type {t!r}")


def problem_from_spec(spec: dict | str, dtype=jnp.float64) -> TrajOptProblem:
    """Build a TrajOptProblem from a spec dict or JSON string."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    model = _model_from_spec(spec["model"], dtype) if "model" in spec else None
    space = _space_from_spec(spec["space"], model)
    nu = int(spec["nu"])
    nsteps = int(spec["nsteps"])
    dyn = _dynamics_from_spec(spec["dynamics"], dtype, model)
    cost = _cost_from_spec(spec["cost"], space, dtype, model)
    tcost = _cost_from_spec(spec["term_cost"], space, dtype, model)

    def cstr_list(key):
        out = []
        for e in spec.get(key, []):
            res = _residual_from_spec(e["residual"], space, dtype, model)
            st = _set_from_spec(e["set"])
            nr = int(e.get("nr") or len(e["residual"].get("target", [])) or 0)
            if nr == 0:
                raise ValueError("constraint entry needs 'nr' or a 'target'")
            out.append((res, st, nr))
        return tuple(out)

    return build_problem(
        space, nu, nsteps, _arr(spec["x0"], dtype), dyn, cost, tcost,
        constraints=cstr_list("constraints"),
        term_constraints=cstr_list("term_constraints"),
    )
