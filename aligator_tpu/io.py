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
     "constraints": [{"residual": RES, "set": SET, "nr": n}, ...],
     "term_constraints": [...]}
    MODEL = {"type": "serial_chain", "n_links": 6}
          | {"type": "humanoid"}
          | {"type": "urdf", "path": "robot.urdf", ["free_flyer": false]}
    ODE  = {"type": "linear", "A":.., "B":.., "c":..}
         | {"type": "unicycle"}                      # the se2-car body-frame ODE
         | {"type": "multibody_free_fwd",
            "actuation": "full" | "floating_base"}   # uses "model"
         | {"type": "multibody_constraint_fwd",      # contact dynamics
            "actuation": "full" | "floating_base",
            "contacts": CONTACTS}
         | {"type": "kinodynamics", "frames": ["left_sole", ..],
            "force_size": 3|6, "active": [..]}
         | {"type": "centroidal" | "continuous_centroidal",
            "mass": m, "gravity": [0,0,-9.81], "force_size": 3|6,
            "contact_map": CMAP}
    CONTACTS = {"frames": [["left_sole", 6], ..], "kp": 100.0, "kd": 50.0,
                ["anchor_q": [..]],               # anchor placements at q
                ["active": [..] | PER_STAGE]}     # 0/1 flags
    CMAP = {"names": [..], "poses": [[..]], ["active": [..] | PER_STAGE]}
    COST = {"type": "quadratic", "Wx":.., "Wu":.., ["N":..]}
         | {"type": "quad_state", "target":.., "W":..}
         | {"type": "quad_control", "target":.., "W":..}
         | {"type": "quad_residual", "residual": RES, "W":..}
         | {"type": "stack", "components": [[COST, weight | PER_STAGE], ...]}
    RES  = {"type": "state_error", "target": [..]}
         | {"type": "control_error", "target": [..]}
         | {"type": "linear", "A":.., "B":.., "c":..}
         | {"type": "frame_translation", "frame": "tool0", "ref": [..]}
         | {"type": "frame_placement", "frame": "..", "ref_R": [[..]], "ref_p": [..]}
         | {"type": "frame_velocity", "frame": "..", "ref": [..6..]}
         | {"type": "fly_high", "frame": "..", "slope": s}
         | {"type": "com_translation", "ref": [..3..]}
         | {"type": "com_velocity", "ref": [..3..]}
         | {"type": "centroidal_momentum", "ref": [..6..]}
         | {"type": "centroidal_momentum_derivative", "frames": [..],
            "active": [..], "force_size": 3|6}
         | {"type": "contact_force", "contacts": CONTACTS, "actuation": "..",
            "contact": "left_sole", "fref": [..]}
         | {"type": "friction_cone", "contacts": CONTACTS, "actuation": "..",
            "contact": "..", "mu": 0.7}
         | {"type": "wrench_cone", "contacts": CONTACTS, "actuation": "..",
            "contact": "..", "mu": 0.7, "half_length": 0.1, "half_width": 0.05}
         | {"type": "centroidal_com", "ref": [..3..]}          # centroidal state
         | {"type": "linear_momentum", "ref": [..3..]}
         | {"type": "angular_momentum", "ref": [..3..]}
         | {"type": "centroidal_acceleration", "mass":, "gravity":,
            "contact_map": CMAP, "force_size": 3|6}
         | {"type": "centroidal_friction_cone", "mu":, "epsilon":, "k": 0}
         | {"type": "centroidal_wrench_cone", "mu":, "half_length":,
            "half_width":, "k": 0}
         | {"type": "frame_collision", "geom1": GEOM, "geom2": GEOM}
    GEOM = {"frame": "tool0" | null,      # null/absent = world-fixed
            "kind": "sphere|capsule|box|convex|halfspace",
            ["radius":], ["half_length":], ["offset_p": [..3..]],
            ["half_extents": [..3..]], ["vertices": [[..3..], ..]]}
    SET  = {"type": "equality"} | {"type": "negative_orthant"}
         | {"type": "box", "lower": [..], "upper": [..]}
         | {"type": "l1", "scale": s}

Per-stage heterogeneity (the talos-walk contact schedule, swing targets,
phase-gated cost weights): any array value may be wrapped as
    PER_STAGE = {"per_stage": [v_0, v_1, ... v_{N-1}]}
The problem is built from stage 0's value and the full (N, ...) array is
stamped into the stacked stage pytree afterwards — the same mechanism
examples/talos_walk.py uses by hand.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

import jax
import jax.numpy as jnp

from aligator_tpu import manifolds as M
from aligator_tpu import costs as C
from aligator_tpu import constraints as S
from aligator_tpu.problem import TrajOptProblem, build_problem


@dataclasses.dataclass
class _Ctx:
    """Parse context. ``mode`` selects how {"per_stage": ...} values are
    resolved: "first" → stage-0 representative (for building the tiled
    problem), "full" → the whole (N, ...) array (for stamping).
    ``nsteps`` (when known) validates per_stage lengths; ``where``
    names positions that never get stamped (x0/term_cost/…) so a
    per_stage value there is a hard error instead of a silent drop."""

    dtype: Any
    mode: str = "first"
    model: Any = None
    has_per_stage: bool = False
    nsteps: Optional[int] = None
    where: Optional[str] = None


def _arr(v, ctx: _Ctx):
    if isinstance(v, dict) and "per_stage" in v:
        if ctx.where is not None:
            raise ValueError(
                f"'per_stage' is not allowed in {ctx.where}: these values "
                "apply to a single (initial/terminal) node, never to the "
                "running stages, and would be silently ignored"
            )
        full = jnp.asarray(v["per_stage"], ctx.dtype)
        if ctx.nsteps is not None and full.shape[0] != ctx.nsteps:
            raise ValueError(
                f"per_stage list has {full.shape[0]} entries, expected "
                f"nsteps={ctx.nsteps}"
            )
        ctx.has_per_stage = True
        return full if ctx.mode == "full" else full[0]
    return jnp.asarray(v, ctx.dtype)


def _model_from_spec(m: dict, dtype):
    """Multibody model specs (referenced by space/dynamics/frame residuals)."""
    from aligator_tpu import multibody as mb

    t = m["type"]
    if t == "serial_chain":
        return mb.build_serial_chain(n_links=int(m["n_links"]), dtype=dtype)
    if t == "humanoid":
        # same resolution as examples/talos_walk.py (URDF asset → builder
        # fallback) so spec-built problems stay pytree-identical to the
        # hand-built ones
        from aligator_tpu.multibody.urdf import load_talos_like

        return load_talos_like(dtype)
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


def _actuation_from_spec(name: str, ctx: _Ctx):
    from aligator_tpu.dynamics.multibody import (
        floating_base_actuation,
        full_actuation,
    )

    if ctx.model is None:
        raise ValueError("multibody actuation needs a top-level 'model'")
    return (full_actuation(ctx.model, ctx.dtype) if name == "full"
            else floating_base_actuation(ctx.model, ctx.dtype))


def _contacts_from_spec(c: dict, ctx: _Ctx):
    """CONTACTS → multibody ContactSet (contact dynamics / force residuals)."""
    from aligator_tpu import multibody as mb

    if ctx.model is None:
        raise ValueError("contact set needs a top-level 'model'")
    cs = mb.make_contact_set(
        ctx.model,
        tuple((str(n), int(d)) for n, d in c["frames"]),
        kp=float(c.get("kp", 100.0)),
        kd=float(c.get("kd", 50.0)),
        dtype=ctx.dtype,
    )
    if "anchor_q" in c:
        cs = mb.anchor_at_configuration(ctx.model, cs, _arr(c["anchor_q"], ctx))
    if "anchor_R" in c:
        cs = cs.replace(anchor_R=_arr(c["anchor_R"], ctx))
    if "anchor_p" in c:
        cs = cs.replace(anchor_p=_arr(c["anchor_p"], ctx))
    if "active" in c:
        cs = cs.replace(active=_arr(c["active"], ctx))
    return cs


def _contact_map_from_spec(c: dict, ctx: _Ctx):
    from aligator_tpu.dynamics.centroidal import ContactMap

    cm = ContactMap.create(
        tuple(c["names"]), _arr(c["poses"], ctx), dtype=ctx.dtype
    )
    if "active" in c:
        cm = cm.replace(active=_arr(c["active"], ctx))
    return cm


def _residual_from_spec(r: dict, space, ctx: _Ctx):
    from aligator_tpu.functions import (
        StateErrorResidual,
        ControlErrorResidual,
        LinearFunction,
    )

    t = r["type"]
    model = ctx.model
    if t == "state_error":
        return StateErrorResidual(target=_arr(r["target"], ctx), space=space)
    if t == "control_error":
        return ControlErrorResidual(target=_arr(r["target"], ctx))
    if t == "linear":
        return LinearFunction(
            A=_arr(r["A"], ctx), B=_arr(r["B"], ctx), c=_arr(r["c"], ctx)
        )
    if t in ("frame_translation", "frame_placement", "frame_velocity",
             "fly_high"):
        if model is None:
            raise ValueError(f"{t} residual needs a top-level 'model'")
        fid = model.frame_id(r["frame"])
        if t == "frame_translation":
            from aligator_tpu.functions.frames import FrameTranslationResidual

            return FrameTranslationResidual(
                model=model, ref=_arr(r["ref"], ctx), frame_id=fid
            )
        if t == "frame_velocity":
            from aligator_tpu.functions.frames import FrameVelocityResidual

            return FrameVelocityResidual(
                model=model, ref=_arr(r["ref"], ctx), frame_id=fid
            )
        if t == "fly_high":
            from aligator_tpu.functions.frames import FlyHighResidual

            return FlyHighResidual(
                model=model, slope=_arr(r.get("slope", 1.0), ctx), frame_id=fid
            )
        from aligator_tpu.functions.frames import FramePlacementResidual

        return FramePlacementResidual(
            model=model, ref_R=_arr(r["ref_R"], ctx), ref_p=_arr(r["ref_p"], ctx),
            frame_id=fid,
        )
    if t in ("com_translation", "com_velocity", "centroidal_momentum"):
        from aligator_tpu.functions.frames import (
            CenterOfMassTranslationResidual,
            CenterOfMassVelocityResidual,
            CentroidalMomentumResidual,
        )

        if model is None:
            raise ValueError(f"{t} residual needs a top-level 'model'")
        cls = {
            "com_translation": CenterOfMassTranslationResidual,
            "com_velocity": CenterOfMassVelocityResidual,
            "centroidal_momentum": CentroidalMomentumResidual,
        }[t]
        return cls(model=model, ref=_arr(r["ref"], ctx))
    if t == "centroidal_momentum_derivative":
        from aligator_tpu.functions.frames import (
            CentroidalMomentumDerivativeResidual,
        )

        if model is None:
            raise ValueError(f"{t} residual needs a top-level 'model'")
        fids = tuple(model.frame_id(n) for n in r["frames"])
        return CentroidalMomentumDerivativeResidual(
            model=model, active=_arr(r["active"], ctx), frame_ids=fids,
            force_size=int(r.get("force_size", 3)),
        )
    if t in ("contact_force", "friction_cone", "wrench_cone"):
        from aligator_tpu.functions.contact import (
            ContactForceResidual,
            MultibodyFrictionConeResidual,
            MultibodyWrenchConeResidual,
            wrench_cone_matrix,
        )

        if model is None:
            raise ValueError(f"{t} residual needs a top-level 'model'")
        contacts = _contacts_from_spec(r["contacts"], ctx)
        act = _actuation_from_spec(r.get("actuation", "floating_base"), ctx)
        if t == "contact_force":
            return ContactForceResidual(
                model=model, actuation=act, contacts=contacts,
                fref=_arr(r["fref"], ctx), contact_name=str(r["contact"]),
            )
        if t == "friction_cone":
            return MultibodyFrictionConeResidual(
                model=model, actuation=act, contacts=contacts,
                mu=_arr(r.get("mu", 0.7), ctx), contact_name=str(r["contact"]),
            )
        return MultibodyWrenchConeResidual(
            model=model, actuation=act, contacts=contacts,
            Acone=wrench_cone_matrix(
                float(r.get("mu", 0.7)), float(r.get("half_length", 0.1)),
                float(r.get("half_width", 0.05)), dtype=ctx.dtype,
            ),
            contact_name=str(r["contact"]),
        )
    if t in ("centroidal_com", "linear_momentum", "angular_momentum"):
        from aligator_tpu.functions.centroidal import (
            AngularMomentumResidual,
            CentroidalCoMResidual,
            LinearMomentumResidual,
        )

        cls = {
            "centroidal_com": CentroidalCoMResidual,
            "linear_momentum": LinearMomentumResidual,
            "angular_momentum": AngularMomentumResidual,
        }[t]
        return cls(ref=_arr(r["ref"], ctx))
    if t == "centroidal_acceleration":
        from aligator_tpu.functions.centroidal import (
            CentroidalAccelerationResidual,
        )

        return CentroidalAccelerationResidual(
            contact_map=_contact_map_from_spec(r["contact_map"], ctx),
            mass=_arr(r["mass"], ctx), gravity=_arr(r["gravity"], ctx),
            force_size=int(r.get("force_size", 3)),
        )
    if t == "centroidal_friction_cone":
        from aligator_tpu.functions.centroidal import (
            CentroidalFrictionConeResidual,
        )

        return CentroidalFrictionConeResidual(
            mu=_arr(r.get("mu", 0.7), ctx),
            epsilon=_arr(r.get("epsilon", 1e-9), ctx), k=int(r.get("k", 0)),
        )
    if t == "centroidal_wrench_cone":
        from aligator_tpu.functions.centroidal import (
            CentroidalWrenchConeResidual,
        )

        return CentroidalWrenchConeResidual(
            mu=float(r.get("mu", 0.7)), hL=float(r.get("half_length", 0.1)),
            hW=float(r.get("half_width", 0.05)), k=int(r.get("k", 0)),
        )
    if t == "frame_collision":
        from aligator_tpu.functions.frames import FrameCollisionResidual

        if model is None:
            raise ValueError("frame_collision residual needs a 'model'")
        return FrameCollisionResidual(
            model=model,
            geom1=_geom_from_spec(r["geom1"], model),
            geom2=_geom_from_spec(r["geom2"], model),
        )
    raise ValueError(f"unknown residual type {t!r}")


def _geom_from_spec(g: dict, model):
    from aligator_tpu.multibody.geometry import GeomObject

    frame = g.get("frame")
    kw = dict(
        frame_id=-1 if frame is None else model.frame_id(frame),
        kind=str(g.get("kind", "sphere")),
        radius=float(g.get("radius", 0.05)),
        half_length=float(g.get("half_length", 0.0)),
        offset_p=tuple(g.get("offset_p", (0.0, 0.0, 0.0))),
        half_extents=tuple(g.get("half_extents", (0.0, 0.0, 0.0))),
    )
    if "vertices" in g:
        kw["vertices"] = tuple(tuple(v) for v in g["vertices"])
    return GeomObject(**kw)


def _geom_to_spec(g, model) -> dict:
    out = {
        "frame": None if g.frame_id < 0 else model.frames[g.frame_id].name,
        "kind": g.kind, "radius": float(g.radius),
        "half_length": float(g.half_length),
        "offset_p": list(g.offset_p), "half_extents": list(g.half_extents),
    }
    if g.vertices is not None:
        out["vertices"] = [list(v) for v in g.vertices]
    return out


def _set_from_spec(s: dict):
    t = s["type"]
    if t == "equality":
        return S.EqualityConstraint()
    if t == "negative_orthant":
        return S.NegativeOrthant()
    if t == "box":
        return S.BoxConstraint(lower=tuple(s["lower"]), upper=tuple(s["upper"]))
    if t == "l1":
        return S.L1Penalty(scale=float(s.get("scale", 1.0)))
    raise ValueError(f"unknown set type {t!r}")


def _cost_from_spec(c: dict, space, ctx: _Ctx):
    t = c["type"]
    if t == "quadratic":
        return C.QuadraticCost.create(
            _arr(c["Wx"], ctx), _arr(c["Wu"], ctx),
            N=_arr(c["N"], ctx) if "N" in c else None,
        )
    if t == "quad_state":
        return C.QuadraticStateCost(space, _arr(c["target"], ctx),
                                    _arr(c["W"], ctx))
    if t == "quad_control":
        return C.QuadraticControlCost(_arr(c["target"], ctx), _arr(c["W"], ctx))
    if t == "quad_residual":
        return C.QuadraticResidualCost(
            residual=_residual_from_spec(c["residual"], space, ctx),
            W=_arr(c["W"], ctx),
        )
    if t == "stack":
        return C.CostStack.create(
            *[(_cost_from_spec(cc, space, ctx), _arr(w, ctx))
              for cc, w in c["components"]]
        )
    raise ValueError(f"unknown cost type {t!r}")


def _ode_from_spec(ode_spec: dict, ctx: _Ctx):
    from aligator_tpu.dynamics import LinearODE

    t = ode_spec["type"]
    model = ctx.model
    if t == "linear":
        return LinearODE(A=_arr(ode_spec["A"], ctx),
                         B=_arr(ode_spec["B"], ctx),
                         c=_arr(ode_spec["c"], ctx))
    if t == "unicycle":
        # the se2-car body-frame ODE (examples/se2_car.py CarDynamics;
        # reference examples/se2-car.hpp:34-100)
        from aligator_tpu.functions.custom import CustomODE

        def xdot(space_, x, u):
            v, w = u[..., 0], u[..., 1]
            return jnp.stack([v, jnp.zeros_like(v), w], axis=-1)

        return CustomODE(fn=xdot)
    if t == "multibody_free_fwd":
        from aligator_tpu.dynamics.multibody import MultibodyFreeFwdDynamics

        if model is None:
            raise ValueError("multibody_free_fwd ode needs a top-level 'model'")
        return MultibodyFreeFwdDynamics(
            model=model,
            actuation=_actuation_from_spec(ode_spec.get("actuation", "full"), ctx),
        )
    if t == "multibody_constraint_fwd":
        from aligator_tpu.dynamics.multibody import MultibodyConstraintFwdDynamics

        if model is None:
            raise ValueError("multibody_constraint_fwd ode needs a 'model'")
        return MultibodyConstraintFwdDynamics(
            model=model,
            actuation=_actuation_from_spec(
                ode_spec.get("actuation", "floating_base"), ctx
            ),
            contacts=_contacts_from_spec(ode_spec["contacts"], ctx),
        )
    if t == "kinodynamics":
        from aligator_tpu.dynamics.multibody import KinodynamicsFwdDynamics

        if model is None:
            raise ValueError("kinodynamics ode needs a top-level 'model'")
        fids = tuple(model.frame_id(n) for n in ode_spec["frames"])
        nk = len(fids)
        active = _arr(ode_spec.get("active", [1.0] * nk), ctx)
        return KinodynamicsFwdDynamics(
            model=model, active=active, frame_ids=fids,
            force_size=int(ode_spec.get("force_size", 3)),
        )
    if t in ("centroidal", "continuous_centroidal"):
        from aligator_tpu.dynamics.centroidal import (
            CentroidalFwdDynamics,
            ContinuousCentroidalFwdDynamics,
        )

        cls = (CentroidalFwdDynamics if t == "centroidal"
               else ContinuousCentroidalFwdDynamics)
        return cls(
            contact_map=_contact_map_from_spec(ode_spec["contact_map"], ctx),
            mass=_arr(ode_spec["mass"], ctx),
            gravity=_arr(ode_spec.get("gravity", [0.0, 0.0, -9.81]), ctx),
            force_size=int(ode_spec.get("force_size", 3)),
        )
    raise ValueError(f"unknown ode type {t!r}")


def _dynamics_from_spec(d: dict, ctx: _Ctx):
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
            A=_arr(d["A"], ctx), B=_arr(d["B"], ctx), c=_arr(d["c"], ctx)
        )
    if t == "integrator":
        ode = _ode_from_spec(d["ode"], ctx)
        dt = jnp.asarray(d["dt"], ctx.dtype)
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


def _merge_per_stage(tiled, full, nsteps: int):
    """Stamp per-stage leaves into the tiled stage pytree: a spec leaf
    whose shape already equals the tiled leaf's (N, ...) shape is a
    per-stage array and replaces the tile; anything else keeps the tile."""
    return jax.tree.map(
        lambda t, f: f if f.shape == t.shape else t, tiled, full
    )


def problem_from_spec(spec: dict | str, dtype=jnp.float64) -> TrajOptProblem:
    """Build a TrajOptProblem from a spec dict or JSON string."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    model = _model_from_spec(spec["model"], dtype) if "model" in spec else None
    nu = int(spec["nu"])
    nsteps = int(spec["nsteps"])
    ctx = _Ctx(dtype=dtype, mode="first", model=model, nsteps=nsteps)
    space = _space_from_spec(spec["space"], model)
    dyn = _dynamics_from_spec(spec["dynamics"], ctx)
    cost = _cost_from_spec(spec["cost"], space, ctx)
    # single-node positions parse with a ctx that rejects per_stage values
    # (they would never be stamped — ADVICE r4)
    tctx = dataclasses.replace(ctx, where="term_cost")
    tcost = _cost_from_spec(spec["term_cost"], space, tctx)

    def cstr_list(key, c):
        out = []
        for e in spec.get(key, []):
            res = _residual_from_spec(e["residual"], space, c)
            st = _set_from_spec(e["set"])
            tgt = e["residual"].get("target")
            if isinstance(tgt, dict) and "per_stage" in tgt:
                # len() of the wrapper dict is meaningless — infer the
                # residual dim from one stage's value (ADVICE r4)
                tgt = tgt["per_stage"][0]
            nr = int(e.get("nr") or (len(tgt) if tgt is not None else 0))
            if nr == 0:
                raise ValueError("constraint entry needs 'nr' or a 'target'")
            out.append((res, st, nr))
        return tuple(out)

    cstrs = cstr_list("constraints", ctx)
    problem = build_problem(
        space, nu, nsteps,
        _arr(spec["x0"], dataclasses.replace(ctx, where="x0")),
        dyn, cost, tcost,
        constraints=cstrs,
        term_constraints=cstr_list(
            "term_constraints", dataclasses.replace(ctx, where="term_constraints")
        ),
    )

    if ctx.has_per_stage:
        # second pass: parse with the full (N, ...) arrays and stamp them
        # into the stacked stage pytrees (the talos-walk mechanism)
        fctx = _Ctx(dtype=dtype, mode="full", model=model, nsteps=nsteps)
        dyn_f = _dynamics_from_spec(spec["dynamics"], fctx)
        cost_f = _cost_from_spec(spec["cost"], space, fctx)
        cstr_f = cstr_list("constraints", fctx)
        problem = problem.replace(
            dynamics=_merge_per_stage(problem.dynamics, dyn_f, nsteps),
            cost=_merge_per_stage(problem.cost, cost_f, nsteps),
            constraints=tuple(
                _merge_per_stage(t, f[0], nsteps)
                for t, f in zip(problem.constraints, cstr_f)
            ),
        )
    return problem


# ---------------------------------------------------------------------------
# Exporter: TrajOptProblem → spec (the reverse direction the reference's
# croc-compat never had; closes VERDICT r3 missing #3 — "nothing emits
# specs from an existing problem"). Coverage mirrors the importer's
# schema; CustomODE (arbitrary Python callables) and custom user classes
# are not serializable and raise.
# ---------------------------------------------------------------------------


def _unstage(leaf, nsteps: int):
    """Un-tile a stacked (N, ...) leaf: a time-invariant leaf (all rows
    equal) exports as its stage-0 value; a genuinely per-stage one as
    {"per_stage": [...]}."""
    import numpy as np

    a = np.asarray(leaf)
    if a.ndim >= 1 and a.shape[0] == nsteps:
        if bool(np.all(a == a[0])):
            return a[0].tolist()
        return {"per_stage": a.tolist()}
    return a.tolist()


def _space_to_spec(space):
    name = type(space).__name__
    if name == "VectorSpace":
        return {"type": "vector", "dim": int(space.ndx)}
    if name in ("SE2", "SE3", "SO2", "SO3"):
        return {"type": name.lower()}
    if name == "MultibodyPhaseSpace":
        return {"type": "multibody_phase"}
    if name == "TangentBundle":
        # MultibodyPhaseSpace is a factory returning TangentBundle(Q)
        from aligator_tpu.multibody.spaces import MultibodyConfiguration

        if type(getattr(space, "base", None)).__name__ in (
            "MultibodyConfiguration", "ConfigurationSpace"
        ):
            return {"type": "multibody_phase"}
    raise ValueError(f"cannot export space {name}")


def _actuation_to_spec(act, model):
    import numpy as np

    a = np.asarray(act)
    if a.ndim == 3:  # tiled stage leaf (N, nv, nu) — actuation is static
        a = a[0]
    nv = model.nv
    if a.shape == (nv, nv) and np.allclose(a, np.eye(nv)):
        return "full"
    full = np.zeros((nv, nv - 6))
    full[6:, :] = np.eye(nv - 6)
    if a.shape == (nv, nv - 6) and np.allclose(a, full):
        return "floating_base"
    raise ValueError("cannot export a non-standard actuation matrix")


def _contacts_to_spec(cs, nsteps: int):
    import numpy as np

    out = {
        "frames": [[s.name, int(s.dim)] for s in cs.specs],
        "kp": float(np.asarray(cs.kp).reshape(-1)[0]),
        "kd": float(np.asarray(cs.kd).reshape(-1)[0]),
        "anchor_R": _unstage(cs.anchor_R, nsteps),
        "anchor_p": _unstage(cs.anchor_p, nsteps),
        "active": _unstage(cs.active, nsteps),
    }
    return out


def _residual_to_spec(r, nsteps: int, model_spec):
    name = type(r).__name__
    u = lambda v: _unstage(v, nsteps)
    if name == "StateErrorResidual":
        return {"type": "state_error", "target": u(r.target)}
    if name == "ControlErrorResidual":
        return {"type": "control_error", "target": u(r.target)}
    if name == "LinearFunction":
        return {"type": "linear", "A": u(r.A), "B": u(r.B), "c": u(r.c)}
    if name == "FrameTranslationResidual":
        return {"type": "frame_translation", "frame": r.model.frames[r.frame_id].name,
                "ref": u(r.ref)}
    if name == "FramePlacementResidual":
        return {"type": "frame_placement", "frame": r.model.frames[r.frame_id].name,
                "ref_R": u(r.ref_R), "ref_p": u(r.ref_p)}
    if name == "FrameVelocityResidual":
        return {"type": "frame_velocity", "frame": r.model.frames[r.frame_id].name,
                "ref": u(r.ref)}
    if name == "FlyHighResidual":
        return {"type": "fly_high", "frame": r.model.frames[r.frame_id].name,
                "slope": u(r.slope)}
    if name == "CenterOfMassTranslationResidual":
        return {"type": "com_translation", "ref": u(r.ref)}
    if name == "CenterOfMassVelocityResidual":
        return {"type": "com_velocity", "ref": u(r.ref)}
    if name == "CentroidalMomentumResidual":
        return {"type": "centroidal_momentum", "ref": u(r.ref)}
    if name == "CentroidalCoMResidual":
        return {"type": "centroidal_com", "ref": u(r.ref)}
    if name == "LinearMomentumResidual":
        return {"type": "linear_momentum", "ref": u(r.ref)}
    if name == "AngularMomentumResidual":
        return {"type": "angular_momentum", "ref": u(r.ref)}
    if name == "CentroidalFrictionConeResidual":
        return {"type": "centroidal_friction_cone", "mu": u(r.mu),
                "epsilon": u(r.epsilon), "k": int(r.k)}
    if name == "CentroidalWrenchConeResidual":
        return {"type": "centroidal_wrench_cone", "mu": float(r.mu),
                "half_length": float(r.hL), "half_width": float(r.hW),
                "k": int(r.k)}
    if name == "CentroidalMomentumDerivativeResidual":
        return {"type": "centroidal_momentum_derivative",
                "frames": [r.model.frames[f].name for f in r.frame_ids],
                "active": u(r.active), "force_size": int(r.force_size)}
    if name == "CentroidalAccelerationResidual":
        cm = r.contact_map
        return {"type": "centroidal_acceleration", "mass": u(r.mass),
                "gravity": u(r.gravity), "force_size": int(r.force_size),
                "contact_map": {"names": list(cm.names), "poses": u(cm.poses),
                                "active": u(cm.active)}}
    if name in ("ContactForceResidual", "MultibodyFrictionConeResidual",
                "MultibodyWrenchConeResidual"):
        base = {"contacts": _contacts_to_spec(r.contacts, nsteps),
                "actuation": _actuation_to_spec(r.actuation, r.model),
                "contact": r.contact_name}
        if name == "ContactForceResidual":
            return {"type": "contact_force", "fref": u(r.fref), **base}
        if name == "MultibodyFrictionConeResidual":
            return {"type": "friction_cone", "mu": u(r.mu), **base}
        # wrench cone: the class stores only the built 17×6 Acone; recover
        # (mu, hL, hW) from its fixed row structure (wrench_cone_matrix)
        # and verify the rebuild — non-standard matrices are not exportable
        import numpy as np

        from aligator_tpu.functions.contact import wrench_cone_matrix

        A = np.asarray(r.Acone)
        if A.ndim == 3:  # tiled per-stage (N, 17, 6)
            if not np.all(A == A[0]):
                raise ValueError("cannot export a per-stage wrench-cone Acone")
            A = A[0]
        mu, hW, hL = float(-A[1, 2]), float(-A[5, 2]), float(-A[7, 2])
        if not np.allclose(A, np.asarray(wrench_cone_matrix(mu, hL, hW))):
            raise ValueError("cannot export a non-standard wrench-cone Acone")
        return {"type": "wrench_cone", "mu": mu, "half_length": hL,
                "half_width": hW, **base}
    if name == "FrameCollisionResidual":
        return {"type": "frame_collision",
                "geom1": _geom_to_spec(r.geom1, r.model),
                "geom2": _geom_to_spec(r.geom2, r.model)}
    raise ValueError(f"cannot export residual {name}")


def _set_to_spec(s):
    name = type(s).__name__
    if name == "EqualityConstraint":
        return {"type": "equality"}
    if name == "NegativeOrthant":
        return {"type": "negative_orthant"}
    if name == "BoxConstraint":
        return {"type": "box", "lower": list(s.lower), "upper": list(s.upper)}
    if name == "L1Penalty":
        return {"type": "l1", "scale": float(s.scale)}
    raise ValueError(f"cannot export constraint set {name}")


def _cost_to_spec(c, nsteps: int, model_spec):
    import numpy as np

    name = type(c).__name__
    u = lambda v: _unstage(v, nsteps)
    if name == "QuadraticCost":
        out = {"type": "quadratic", "Wx": u(c.Wx), "Wu": u(c.Wu)}
        if np.asarray(c.N).size and np.any(np.asarray(c.N)):
            out["N"] = u(c.N)
        return out
    if name == "QuadraticStateCost":
        return {"type": "quad_state", "target": u(c.target), "W": u(c.W)}
    if name == "QuadraticControlCost":
        return {"type": "quad_control", "target": u(c.target), "W": u(c.W)}
    if name == "QuadraticResidualCost":
        return {"type": "quad_residual",
                "residual": _residual_to_spec(c.residual, nsteps, model_spec),
                "W": u(c.W)}
    if name == "CostStack":
        return {"type": "stack", "components": [
            [_cost_to_spec(cc, nsteps, model_spec), _unstage(w, nsteps)]
            for cc, w in zip(c.components, c.weights)
        ]}
    raise ValueError(f"cannot export cost {name}")


def _ode_to_spec(ode, nsteps: int, model_spec):
    name = type(ode).__name__
    u = lambda v: _unstage(v, nsteps)
    if name == "LinearODE":
        return {"type": "linear", "A": u(ode.A), "B": u(ode.B), "c": u(ode.c)}
    if name == "MultibodyFreeFwdDynamics":
        return {"type": "multibody_free_fwd",
                "actuation": _actuation_to_spec(ode.actuation, ode.model)}
    if name == "MultibodyConstraintFwdDynamics":
        return {"type": "multibody_constraint_fwd",
                "actuation": _actuation_to_spec(ode.actuation, ode.model),
                "contacts": _contacts_to_spec(ode.contacts, nsteps)}
    if name == "KinodynamicsFwdDynamics":
        return {"type": "kinodynamics",
                "frames": [ode.model.frames[f].name for f in ode.frame_ids],
                "force_size": int(ode.force_size), "active": u(ode.active)}
    if name in ("CentroidalFwdDynamics", "ContinuousCentroidalFwdDynamics"):
        cm = ode.contact_map
        return {"type": ("centroidal" if name == "CentroidalFwdDynamics"
                         else "continuous_centroidal"),
                "mass": u(ode.mass), "gravity": u(ode.gravity),
                "force_size": int(ode.force_size),
                "contact_map": {"names": list(cm.names),
                                "poses": u(cm.poses), "active": u(cm.active)}}
    raise ValueError(f"cannot export ode {name} (CustomODE callables are "
                     "not serializable)")


def _dynamics_to_spec(dyn, nsteps: int, model_spec):
    name = type(dyn).__name__
    u = lambda v: _unstage(v, nsteps)
    if name == "LinearDiscreteDynamics":
        return {"type": "linear_discrete", "A": u(dyn.A), "B": u(dyn.B),
                "c": u(dyn.c)}
    schemes = {"EulerIntegrator": "euler", "SemiImplEulerIntegrator": "semi_euler",
               "RK2Integrator": "rk2", "RK4Integrator": "rk4",
               "MidpointIntegratorExplicit": "midpoint"}
    if name in schemes:
        return {"type": "integrator", "scheme": schemes[name],
                "dt": u(dyn.dt),
                "ode": _ode_to_spec(dyn.ode, nsteps, model_spec)}
    raise ValueError(f"cannot export dynamics {name}")


def problem_to_spec(problem: TrajOptProblem,
                    model_spec: Optional[dict] = None) -> dict:
    """Export a TrajOptProblem built from the library's component classes
    back to a JSON-able spec (inverse of :func:`problem_from_spec`).

    ``model_spec`` must be supplied when the problem references a
    multibody model (models are built from URDFs or generators — the
    arrays themselves are not round-tripped). Raises ``ValueError`` for
    components outside the spec schema (e.g. ``CustomODE``)."""
    import numpy as np

    N = problem.nsteps
    spec: dict = {
        "space": _space_to_spec(problem.space),
        "nu": int(problem.nu),
        "nsteps": int(N),
        "x0": np.asarray(problem.x0).tolist(),
        "dynamics": _dynamics_to_spec(problem.dynamics, N, model_spec),
        "cost": _cost_to_spec(problem.cost, N, model_spec),
        "term_cost": _cost_to_spec(problem.term_cost, 0, model_spec),
    }
    if model_spec is not None:
        spec["model"] = model_spec
    for key, fns, sets, dims, n_for_unstage in (
        ("constraints", problem.constraints, problem.constraint_sets,
         problem.constraint_dims, N),
        ("term_constraints", problem.term_constraints, problem.term_sets,
         problem.term_dims, 0),
    ):
        entries = []
        for fn, st, nr in zip(fns, sets, dims):
            entries.append({
                "residual": _residual_to_spec(fn, n_for_unstage, model_spec),
                "set": _set_to_spec(st),
                "nr": int(nr),
            })
        if entries:
            spec[key] = entries
    return spec
