"""Reference-semantics NUTS recursion oracle (test-only, eager Python).

A direct transliteration of the recursive doubling algorithm's *structure*
(/root/reference/src/trajectory.jl:626-742) used to validate the iterative
while-loop NUTS in advancedhmc_tpu/nuts.py: same leapfrog leaf sequence, same
U-turn check set, same termination/statistics semantics. Candidate *sampling*
is intentionally untracked (it is randomised); everything deterministic —
leaf counts, depth, Σα, ΔH_max, ρ, edges, total sampler weight, termination
flags — is reproduced exactly given a forced direction sequence.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from advancedhmc_tpu.integrators import leapfrog_step
from advancedhmc_tpu.termination import (
    ClassicNoUTurn,
    StrictGeneralisedNoUTurn,
)


@dataclasses.dataclass
class OTree:
    zleft: object
    zright: object
    rho: object
    sum_alpha: float
    n_alpha: int
    dh_max: float
    logw: float      # multinomial total log weight
    n_slice: int     # slice acceptable-candidate count


def _maxabs(a, b):
    return a if abs(a) > abs(b) else b


def _combine(tl: OTree, tr: OTree) -> OTree:
    return OTree(
        zleft=tl.zleft,
        zright=tr.zright,
        rho=tl.rho + tr.rho,
        sum_alpha=tl.sum_alpha + tr.sum_alpha,
        n_alpha=tl.n_alpha + tr.n_alpha,
        dh_max=_maxabs(tl.dh_max, tr.dh_max),
        logw=np.logaddexp(tl.logw, tr.logw),
        n_slice=tl.n_slice + tr.n_slice,
    )


def _gen_crit(h, rho, r_a, r_b):
    return (
        float(jnp.dot(rho, h.velocity(r_a))) <= 0
        or float(jnp.dot(rho, h.velocity(r_b))) <= 0
    )


def _isterminated(criterion, h, t: OTree, tl=None, tr=None) -> bool:
    if isinstance(criterion, ClassicNoUTurn):
        dtheta = t.zright.theta - t.zleft.theta
        return (
            float(jnp.dot(dtheta, h.velocity(t.zleft.r))) <= 0
            or float(jnp.dot(dtheta, h.velocity(t.zright.r))) <= 0
        )
    s = _gen_crit(h, t.rho, t.zleft.r, t.zright.r)
    if isinstance(criterion, StrictGeneralisedNoUTurn):
        s = s or _gen_crit(h, tl.rho + tr.zleft.r, t.zleft.r, tr.zleft.r)
        s = s or _gen_crit(h, tl.zright.r + tr.rho, tl.zright.r, t.zright.r)
    return s


def _leaf(h, integ, criterion, ts_kind, z, v, h0, lu):
    eps = float(integ.current_step_size) * v
    z2 = leapfrog_step(integ, h, z, eps)
    h2 = float(z2.energy())
    dh = h2 - h0
    alpha = float(np.exp(min(0.0, -dh))) if np.isfinite(dh) else 0.0
    logw = h0 - h2
    n_slice = int(lu <= -h2)
    if ts_kind == "slice":
        div = not (lu < criterion.delta_max - h2)
    else:
        div = not (-h0 < criterion.delta_max - h2)
    tree = OTree(z2, z2, z2.r, alpha, 1, dh, logw, n_slice)
    return tree, False, div


def _build_tree(h, integ, criterion, ts_kind, z, v, j, h0, lu):
    """Returns (tree, dynamic_terminated, numerical_terminated)."""
    if j == 0:
        return _leaf(h, integ, criterion, ts_kind, z, v, h0, lu)
    t1, d1, n1 = _build_tree(h, integ, criterion, ts_kind, z, v, j - 1, h0, lu)
    if d1 or n1:
        return t1, d1, n1
    if v == -1:
        t2, d2, n2 = _build_tree(
            h, integ, criterion, ts_kind, t1.zleft, v, j - 1, h0, lu
        )
        tl, tr = t2, t1
    else:
        t2, d2, n2 = _build_tree(
            h, integ, criterion, ts_kind, t1.zright, v, j - 1, h0, lu
        )
        tl, tr = t1, t2
    t = _combine(tl, tr)
    turn = _isterminated(criterion, h, t, tl, tr)
    return t, (d2 or turn), (n1 or n2)


def nuts_oracle(h, integ, criterion, ts_kind, z0, directions, lu=None):
    """Run the full doubling loop with a forced direction sequence.

    Returns a dict of all deterministic transition quantities.
    """
    h0 = float(z0.energy())
    if lu is None:
        lu = -np.inf  # slice variable; -inf → every leaf acceptable
    tree = OTree(z0, z0, z0.r, 0.0, 0, 0.0, logw=0.0, n_slice=1)
    turning = diverged = False
    j = 0
    while not (turning or diverged) and j < criterion.max_depth:
        v = int(directions[j])
        if v == -1:
            t2, d2, n2 = _build_tree(
                h, integ, criterion, ts_kind, tree.zleft, v, j, h0, lu
            )
            tl, tr = t2, tree
        else:
            t2, d2, n2 = _build_tree(
                h, integ, criterion, ts_kind, tree.zright, v, j, h0, lu
            )
            tl, tr = tree, t2
        sub_terminated = d2 or n2
        if not sub_terminated:
            j += 1
        tree = _combine(tl, tr)
        full_turn = _isterminated(criterion, h, tree, tl, tr)
        turning = turning or d2 or full_turn
        diverged = diverged or n2
    return dict(
        n_steps=tree.n_alpha,
        depth=j,
        sum_alpha=tree.sum_alpha,
        dh_max=tree.dh_max,
        diverged=diverged,
        rho=np.asarray(tree.rho),
        zleft_theta=np.asarray(tree.zleft.theta),
        zright_theta=np.asarray(tree.zright.theta),
        logw=tree.logw,
        n_slice=tree.n_slice,
        h0=h0,
    )
