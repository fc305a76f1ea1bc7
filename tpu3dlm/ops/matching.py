"""Bipartite assignment on TPU: Jacobi auction algorithm with slack objects.

Solves the missing-object matching of the reference's missing
``src/map_alignment/comparison.py::BBoxComparison.match_bboxes`` (contract:
bipartite matching of gold-standard vs aligned-maintenance boxes to flag
missing objects — SURVEY.md §2b, README.md:67-73) as a static-shape JAX
program: a vectorised auction (all unassigned bidders bid simultaneously;
the highest bid per object wins) inside ``lax.while_loop``, with ε-scaling
for optimality. Each row gets a private *slack* column priced at the unmatch
cost, so the threshold "too far to be the same object" is part of the
assignment itself and the problem is always feasible.

Exactness is cross-checked against scipy's Hungarian solver in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG = -1e15


@partial(jax.jit, static_argnames=("max_iters",))
def auction_assign(
    cost: jax.Array,  # (n, m) costs; jnp.inf = forbidden pair
    unmatch_cost: float | jax.Array = 1e9,
    max_iters: int = 100_000,
) -> tuple[jax.Array, jax.Array]:
    """Minimum-cost assignment with a per-row unmatch option.

    Returns (assign (n,), matched (n,)): assign[i] = column matched to row i,
    -1 when the row preferred its slack (unmatched). Feasible for any n, m.
    """
    n, m = cost.shape
    benefit = jnp.where(jnp.isfinite(cost), -cost.astype(jnp.float32), _NEG)
    # slack objects: row i may always take private column m+i at -unmatch_cost
    slack = jnp.full((n, n), _NEG, jnp.float32)
    slack = slack.at[jnp.arange(n), jnp.arange(n)].set(
        -jnp.asarray(unmatch_cost, jnp.float32)
    )
    B = jnp.concatenate([benefit, slack], axis=1)  # (n, M)
    M = m + n

    # ε from the REAL benefit spread only (slack entries would blow it up).
    # NOTE: no warm-started ε-scaling — with unassigned objects (m+n > n,
    # always true here) carried-over prices violate complementary slackness
    # on the unassigned columns and the result can be arbitrarily bad; a
    # single cold phase at fine ε is n·ε-optimal by the auction theorem.
    finite = benefit > _NEG / 2
    b_hi = jnp.max(jnp.where(finite, benefit, -jnp.inf))
    b_lo = jnp.min(jnp.where(finite, benefit, jnp.inf))
    spread = jnp.maximum(b_hi - b_lo, 1e-6)
    eps = 1e-3 * spread / (n + 1)

    rows = jnp.arange(n)
    cols = jnp.arange(M)

    def run_phase(owner_prices, eps):
        owner0, prices0 = owner_prices
        del owner0  # assignments reset each phase; prices persist
        owner = jnp.full((M,), -1, jnp.int32)

        def assign_of(owner):
            # unowned objects get an out-of-bounds row index so the scatter
            # drops them (writing a sentinel to index 0 would clobber row 0)
            idx = jnp.where(owner >= 0, owner, n)
            return (
                jnp.full((n,), -1, jnp.int32)
                .at[idx]
                .set(cols.astype(jnp.int32), mode="drop")
            )

        def cond(s):
            owner, prices, it = s
            return jnp.any(assign_of(owner) < 0) & (it < max_iters)

        def body(s):
            owner, prices, it = s
            assign = assign_of(owner)
            unassigned = assign < 0
            values = B - prices[None, :]
            top2_val, top2_idx = jax.lax.top_k(values, 2)
            best_j = top2_idx[:, 0]
            bid = prices[best_j] + (top2_val[:, 0] - top2_val[:, 1]) + eps
            bids = jnp.where(unassigned, bid, -jnp.inf)
            bid_matrix = jnp.where(
                best_j[:, None] == cols[None, :], bids[:, None], -jnp.inf
            )  # (n, M)
            win_bid = jnp.max(bid_matrix, axis=0)
            win_row = jnp.argmax(bid_matrix, axis=0).astype(jnp.int32)
            contested = jnp.isfinite(win_bid)
            owner = jnp.where(contested, win_row, owner)
            prices = jnp.where(contested, win_bid, prices)
            return owner, prices, it + 1

        owner, prices, _ = jax.lax.while_loop(
            cond, body, (owner, prices0, jnp.int32(0))
        )
        return (owner, prices), assign_of(owner)

    state = (jnp.full((M,), -1, jnp.int32), jnp.zeros((M,), jnp.float32))
    state, assign = run_phase(state, eps)

    matched = (assign >= 0) & (assign < m)
    del rows
    return jnp.where(matched, assign, -1).astype(jnp.int32), matched


def match_report(cost: jax.Array, unmatch_cost: float) -> dict[str, jax.Array]:
    """Assignment + derived sets: matched pairs, unmatched rows (missing
    objects), unmatched columns (new objects)."""
    n, m = cost.shape
    assign, matched = auction_assign(cost, unmatch_cost)
    col_taken = (
        jnp.zeros((m,), bool)
        .at[jnp.where(matched, assign, 0)]
        .set(matched, mode="drop")
    )
    return {
        "assign": assign,
        "matched_rows": matched,
        "unmatched_rows": ~matched,
        "unmatched_cols": ~col_taken,
    }
