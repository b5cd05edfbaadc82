"""Problem-spec serialization: build problems from plain dict/JSON specs.

This replaces the reference's Crocoddyl compatibility layer
(compat/crocoddyl/*, SURVEY §2.7): that layer exists to interop with a
CPU library's in-memory objects, which is meaningless on TPU — the
portable equivalent is a declarative problem *specification* that other
front-ends (including a Crocoddyl exporter) can emit. Specs are plain
JSON-able dicts; arrays are nested lists.

Schema (all keys lowercase):
    {"space": {"type": "vector", "dim": 3} | {"type": "se2"} | {"type": "se3"},
     "nu": 2, "nsteps": 20, "x0": [...],
     "dynamics": {"type": "linear_discrete", "A": [[..]], "B": [[..]], "c": [..]}
               | {"type": "integrator", "scheme": "euler|semi_euler|rk2|rk4|midpoint",
                  "dt": 0.01, "ode": {"type": "linear", "A":.., "B":.., "c":..}},
     "cost": COST, "term_cost": COST,
     "constraints": [{"residual": RES, "set": SET}, ...],
     "term_constraints": [...]}
    COST = {"type": "quadratic", "Wx":.., "Wu":.., ["N":..]}
         | {"type": "quad_state", "target":.., "W":..}
         | {"type": "quad_control", "target":.., "W":..}
         | {"type": "stack", "components": [[COST, weight], ...]}
    RES  = {"type": "state_error", "target": [..]}
         | {"type": "control_error", "target": [..]}
         | {"type": "linear", "A":.., "B":.., "c":..}
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


def _space_from_spec(sp: dict):
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
    raise ValueError(f"unknown space type {t!r}")


def _residual_from_spec(r: dict, space, dtype):
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


def _cost_from_spec(c: dict, space, dtype):
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
    if t == "stack":
        return C.CostStack.create(
            *[(_cost_from_spec(cc, space, dtype), w) for cc, w in c["components"]]
        )
    raise ValueError(f"unknown cost type {t!r}")


def _dynamics_from_spec(d: dict, dtype):
    from aligator_tpu.dynamics import (
        LinearDiscreteDynamics,
        LinearODE,
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
        ode_spec = d["ode"]
        if ode_spec["type"] == "linear":
            ode = LinearODE(A=_arr(ode_spec["A"], dtype),
                            B=_arr(ode_spec["B"], dtype),
                            c=_arr(ode_spec["c"], dtype))
        else:
            raise ValueError(f"unknown ode type {ode_spec['type']!r}")
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
    space = _space_from_spec(spec["space"])
    nu = int(spec["nu"])
    nsteps = int(spec["nsteps"])
    dyn = _dynamics_from_spec(spec["dynamics"], dtype)
    cost = _cost_from_spec(spec["cost"], space, dtype)
    tcost = _cost_from_spec(spec["term_cost"], space, dtype)

    def cstr_list(key):
        out = []
        for e in spec.get(key, []):
            res = _residual_from_spec(e["residual"], space, dtype)
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
