"""Mechanical verification that the halo exchange overlaps compute.

The claim (halo.py module docstring, RESULTS r3 scaling table): the
INTERIOR segment-sum stream of every layer has no data dependence on
that layer's PULL all_to_all, and the BOUNDARY stream has none on the
PUSH all_to_all — so XLA's latency-hiding scheduler is *free* to run
the collectives concurrently with local aggregation. On a 1-host dev
box that freedom can't be profiled on real ICI, so this module makes
the claim checkable at the program level: a taint walk over the traced
jaxpr proves the (absence of) dependence edges. XLA cannot ADD data
dependences during compilation, so the jaxpr-level property is the
honest single-host proxy for the schedule-level overlap (VERDICT r3
item 7).

The halo streams are tagged with ``jax.named_scope`` in
halo_typed_aggregate (halo_pull_L{k} / halo_interior_L{k} /
halo_push_L{k} / halo_boundary_L{k}); equations inherit the scope in
``source_info.name_stack``. ``check_halo_overlap`` taints the outputs
of each tagged all_to_all, propagates taints through every equation
(recursing into pjit/shard_map/custom-vjp/scan sub-jaxprs), and fails
if a same-layer interior (resp. boundary) equation consumes a
pull-tainted (resp. push-tainted) value. It also fails if it saw NO
tagged collectives or streams — a silent pass is not a pass.
"""

from __future__ import annotations

import re
from typing import Dict, FrozenSet, Tuple

import jax

Tag = Tuple[str, int]  # ("pull"|"push", layer)

_PULL_RE = re.compile(r"halo_pull_L(\d+)")
_PUSH_RE = re.compile(r"halo_push_L(\d+)")
_INT_RE = re.compile(r"halo_interior_L(\d+)")
_BND_RE = re.compile(r"halo_boundary_L(\d+)")

_EMPTY: FrozenSet[Tag] = frozenset()


def _sub_jaxprs(eqn):
    from jax.extend import core as jex_core

    ClosedJaxpr = jex_core.ClosedJaxpr if hasattr(jex_core, "ClosedJaxpr") \
        else jax.core.ClosedJaxpr  # pragma: no cover
    out = []
    for v in eqn.params.values():
        if isinstance(v, ClosedJaxpr):
            out.append(v.jaxpr)
        elif hasattr(v, "eqns") and hasattr(v, "invars"):
            out.append(v)
        elif isinstance(v, (list, tuple)):
            for w in v:
                if isinstance(w, ClosedJaxpr):
                    out.append(w.jaxpr)
                elif hasattr(w, "eqns") and hasattr(w, "invars"):
                    out.append(w)
    return out


class OverlapReport:
    def __init__(self):
        self.pull_layers = set()
        self.push_layers = set()
        self.interior_layers = set()
        self.boundary_layers = set()
        self.violations = []

    @property
    def ok(self) -> bool:
        return (not self.violations and bool(self.pull_layers)
                and bool(self.interior_layers))

    def summary(self) -> str:
        return (f"pull a2a layers={sorted(self.pull_layers)} "
                f"push={sorted(self.push_layers)} "
                f"interior={sorted(self.interior_layers)} "
                f"boundary={sorted(self.boundary_layers)} "
                f"violations={self.violations or 'none'}")


def _carry_pairs(eqn, sub):
    """(carry_invar, carry_outvar) pairs of a loop body sub-jaxpr, so
    taints can be fed back around the loop. scan bodies carry
    invars[num_consts:num_consts+num_carry] -> outvars[:num_carry];
    while bodies carry invars[body_nconsts:] -> all outvars. The cond
    jaxpr of a while (and any non-loop sub-jaxpr) carries nothing."""
    name = eqn.primitive.name
    if name == "scan":
        nc = eqn.params.get("num_consts", 0)
        nk = eqn.params.get("num_carry", 0)
        ivs = sub.invars[nc:nc + nk]
        ovs = sub.outvars[:nk]
        if len(ivs) == len(ovs):
            return list(zip(ivs, ovs))
    elif name == "while":
        # identify the BODY jaxpr by identity — a length heuristic can
        # mistake the cond jaxpr for it (cond_nconsts + num_carry -
        # body_nconsts == 1 pairs a carry invar with the boolean
        # predicate outvar and over-taints the cond walk)
        body = eqn.params.get("body_jaxpr")
        body = getattr(body, "jaxpr", body)
        if sub is not body:
            return []
        nc = eqn.params.get("body_nconsts", 0)
        ivs = sub.invars[nc:]
        ovs = sub.outvars
        if len(ivs) == len(ovs):
            return list(zip(ivs, ovs))
    return []


def _walk(jaxpr, taint: Dict, rep: OverlapReport):
    """Propagate taints through jaxpr.eqns. ``taint`` maps var -> frozenset
    of tags and is MUTATED; callers seed it with invar taints."""
    from jax._src.core import Literal

    def get(v):
        if isinstance(v, Literal):
            return _EMPTY
        return taint.get(v, _EMPTY)

    for eqn in jaxpr.eqns:
        stack = str(eqn.source_info.name_stack)
        in_t = _EMPTY
        for v in eqn.invars:
            in_t = in_t | get(v)

        # stream checks — the heart of the assertion
        for m in _INT_RE.finditer(stack):
            k = int(m.group(1))
            rep.interior_layers.add(k)
            if ("pull", k) in in_t:
                v = (f"interior_L{k} depends on pull_L{k}",
                     eqn.primitive.name)
                if v not in rep.violations:  # fixpoint re-walks repeat
                    rep.violations.append(v)
        for m in _BND_RE.finditer(stack):
            k = int(m.group(1))
            rep.boundary_layers.add(k)
            if ("push", k) in in_t:
                v = (f"boundary_L{k} depends on push_L{k}",
                     eqn.primitive.name)
                if v not in rep.violations:
                    rep.violations.append(v)

        out_t = in_t
        if eqn.primitive.name == "all_to_all":
            m = _PULL_RE.search(stack)
            if m:
                k = int(m.group(1))
                rep.pull_layers.add(k)
                out_t = out_t | {("pull", k)}
            m = _PUSH_RE.search(stack)
            if m:
                k = int(m.group(1))
                rep.push_layers.add(k)
                out_t = out_t | {("push", k)}

        subs = _sub_jaxprs(eqn)
        if subs:
            # map outer taints onto sub-jaxpr invars when the arity
            # matches (pjit/shard_map/custom_vjp/closed_call); else
            # seed every invar conservatively with the union.
            # Loop-carrying primitives (scan/while) additionally
            # feed body carry-outvar taints back onto the matching
            # carry invars and re-walk to fixpoint, so a dependence
            # routed through a loop carry is visible on iteration-1
            # readers (ADVICE r4: the old fixed two-pass walk never
            # mapped outvars back to invars at all).
            agg_out = _EMPTY
            for sub in subs:
                sub_taint = {}
                if len(sub.invars) == len(eqn.invars):
                    for sv, ov in zip(sub.invars, eqn.invars):
                        sub_taint[sv] = get(ov)
                else:
                    for sv in sub.invars:
                        sub_taint[sv] = in_t
                carries = _carry_pairs(eqn, sub)
                # taint fixpoint: tags only accumulate (monotone over a
                # finite lattice), so |carries| * |distinct tags| bounds
                # the true iteration count; cap generously and FAIL
                # CLOSED if ever hit — silently under-propagating would
                # let a real violation pass the checker
                max_iters = 16 + 2 * len(carries)
                for it in range(max_iters):
                    _walk(sub, sub_taint, rep)
                    changed = False
                    for iv, ov in carries:
                        t_out = sub_taint.get(ov, _EMPTY)
                        t_in = sub_taint.get(iv, _EMPTY)
                        if not t_out <= t_in:
                            sub_taint[iv] = t_in | t_out
                            changed = True
                    if not changed:
                        break
                else:  # pragma: no cover - requires pathological depth
                    rep.violations.append(
                        (f"taint fixpoint not converged after "
                         f"{max_iters} iters in {eqn.primitive.name}",
                         "fixpoint"))
                for sv in sub.outvars:
                    if isinstance(sv, Literal):
                        continue
                    agg_out = agg_out | sub_taint.get(sv, _EMPTY)
            out_t = out_t | agg_out

        for v in eqn.outvars:
            taint[v] = taint.get(v, _EMPTY) | out_t


def check_halo_overlap(fn, *args) -> OverlapReport:
    """Trace ``fn(*args)`` and verify the halo overlap structure.

    Returns an OverlapReport; ``report.ok`` is True iff at least one
    tagged pull-exchange and interior stream were found AND no
    same-layer dependence violation exists. Raise-free — callers assert
    on ``.ok`` so failures print the summary.
    """
    closed = jax.make_jaxpr(fn)(*args)
    rep = OverlapReport()
    _walk(closed.jaxpr, {}, rep)
    return rep
