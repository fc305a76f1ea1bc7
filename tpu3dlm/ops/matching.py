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

ε-scaling needs a COMPLETE assignment for its optimality bound to survive
carried-over prices (the classical theorem is "ε-CS + every object assigned
→ N·ε-optimal", with no condition on initial prices; with unassigned
objects, stale prices from a coarser phase can make the result arbitrarily
bad). We therefore pad the problem symmetric with ``m`` dummy rows that
value every object at 0 and absorb whatever the real rows leave, so every
phase ends with all m+n objects owned and prices can carry across phases.
A single cold fine-ε phase (the round-1 design) is also N·ε-optimal but can
take Θ(spread/ε) bidding rounds in a price war between near-tied rows —
observed 103 s on a 200×200 uniform instance.

The dummies are *identical* bidders, so naive row-wise bidding serializes:
every unassigned dummy chases the same cheapest object and they settle one
per round. They are instead handled as one Bertsekas-style "similar
persons" class: each round the class's u unassigned members collectively
take the u cheapest not-class-owned objects, each priced at ITS OWN price
+ ε (NOT the textbook (u+1)-th-cheapest bid — see the body comment: that
collective overbid inflates prices far beyond what serial member-by-member
bidding reaches and pushes real rows off columns they should win; the
own-price+ε rule adds ≤ (m + #steals)·ε total class-driven inflation,
which folds into the N·ε optimality bound). This keeps rounds
proportional to the real rows' price dynamics, not to m.

(Per-round cost note: ``lax.top_k`` lowers to a sort-based kernel that is
~12× slower than two max/argmax passes on XLA:CPU for the (rows, objects)
value matrix — the two-pass form is used everywhere here.)

Exactness is cross-checked against scipy's Hungarian solver in tests,
including randomized 200–500-sized sweeps with clustered and near-tie costs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG = -1e15


@partial(jax.jit, static_argnames=("max_iters", "phases"))
def auction_assign(
    cost: jax.Array,  # (n, m) costs; jnp.inf = forbidden pair
    unmatch_cost: float | jax.Array = 1e9,
    max_iters: int | None = None,
    phases: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Minimum-cost assignment with a per-row unmatch option.

    Returns (assign (n,), matched (n,)): assign[i] = column matched to row i,
    -1 when the row preferred its slack (unmatched). Feasible for any n, m.

    ``phases``: ε-scaling phase count; benefits are normalized to [0, 1]
    and ε interpolates geometrically from 1/4 down to 1e-3/(N+1), so the
    final assignment is N·ε-optimal = 1e-3·spread-optimal in total cost.
    ``max_iters`` bounds the bidding rounds of each phase. The optimality
    bound assumes every phase ends complete (see module docstring).
    Every row always has its private slack to bid on, so with normalized
    benefits a phase needs O(1/ε) ≈ 4·(N+1)·10³ rounds worst case at the
    finest ε; the default (None) derives exactly that bound from the
    problem size — a while_loop bound costs nothing unless hit — so
    exhaustion is unreachable for well-posed inputs at any size. Should a
    caller-supplied bound still exhaust mid-phase, the failure is
    CONSERVATIVE, not garbage: objects left unowned give their rows
    assign = -1 / matched = False (over-reporting "missing", never
    fabricating a match).
    """
    n, m = cost.shape
    if max_iters is None:
        # worst-case bidding rounds of the finest-ε phase (see docstring);
        # capped so the int32 loop counter cannot wrap on absurd sizes
        max_iters = min(4 * (n + m + 1) * 1000 + 1000, 2**31 - 2)
    benefit = jnp.where(jnp.isfinite(cost), -cost.astype(jnp.float32), _NEG)
    M = m + n  # objects: real columns + private slacks
    N = n + m  # bidders: real rows + the m-member dummy class
    DUMMY = jnp.int32(n)  # owner marker for "some class member owns this"

    # Normalize benefits to [0, 1] with one affine map (same map applied to
    # the slack entries — affine maps leave the optimal assignment
    # invariant). This conditions ε against f32: with raw near-tie costs
    # the spread-derived ε underflows price resolution (price + ε == price)
    # and the final phases spin at max_iters making no progress.
    finite = benefit > _NEG / 2
    # an all-forbidden matrix (e.g. zero label overlap between the two box
    # sets) has no finite entries: the empty max/min would give b_hi=-inf /
    # b_lo=+inf and poison the slack values below — use a 0/0 window so the
    # whole problem degenerates cleanly to "every row takes its slack"
    any_finite = jnp.any(finite)
    b_hi = jnp.where(
        any_finite, jnp.max(jnp.where(finite, benefit, -jnp.inf)), 0.0
    )
    b_lo = jnp.where(
        any_finite, jnp.min(jnp.where(finite, benefit, jnp.inf)), 0.0
    )
    spread = jnp.maximum(b_hi - b_lo, 1e-6)
    benefit = jnp.where(finite, (benefit - b_lo) / spread, _NEG)
    # slack objects: row i may always take private column m+i at -unmatch_cost.
    # The normalized slack must stay strictly ABOVE the forbidden sentinel
    # (unmatch is always preferable to a forbidden pair): with a tiny spread
    # and a large unmatch_cost the raw value can reach/cross _NEG, at which
    # point rows "prefer" forbidden columns — clamp to -1e12. The clamp only
    # binds when unmatch_cost > 1e12·spread, where every finite pair beats
    # unmatching by such a margin that the distortion cannot change the
    # optimal assignment (order slack-below-finite / slack-above-forbidden
    # is preserved).
    slack = jnp.full((n, n), _NEG, jnp.float32)
    slack = slack.at[jnp.arange(n), jnp.arange(n)].set(
        jnp.maximum(
            (-jnp.asarray(unmatch_cost, jnp.float32) - b_lo) / spread, -1e12
        )
    )
    B = jnp.concatenate([benefit, slack], axis=1)  # (n, M) real rows only

    # N·ε_final = 1e-3 in normalized units = 1e-3·spread in cost units
    eps_final = 1e-3 / (N + 1)

    cols = jnp.arange(M)

    def assign_of(owner):
        # unowned / class-owned objects get an out-of-bounds row index so
        # the scatter drops them
        idx = jnp.where((owner >= 0) & (owner < n), owner, n)
        return (
            jnp.full((n,), -1, jnp.int32)
            .at[idx]
            .set(cols.astype(jnp.int32), mode="drop")
        )

    def run_phase(prices0, eps):
        owner = jnp.full((M,), -1, jnp.int32)

        def cond(s):
            owner, prices, it = s
            # complete ⟺ every object owned (real-assigned + class-owned
            # counts can only reach n + m = M when both sides are done)
            return jnp.any(owner < 0) & (it < max_iters)

        def body(s):
            owner, prices, it = s
            assign = assign_of(owner)
            unassigned = assign < 0

            # --- real rows: standard Jacobi bids (two-pass max — see
            # module docstring for why not lax.top_k)
            values = B - prices[None, :]
            v1 = jnp.max(values, axis=1)
            best_j = jnp.argmax(values, axis=1).astype(jnp.int32)
            masked = jnp.where(cols[None, :] == best_j[:, None], -jnp.inf, values)
            v2 = jnp.max(masked, axis=1)
            # cap the increment: a row whose only finite option is its
            # slack (all pairs forbidden) has v2 = _NEG, and an uncapped
            # bid drives that price to ~1e15 — at which point f32 loses
            # the O(1) value differences and later phases (prices carry)
            # degrade into tie-chaos. 2.0 = twice the normalized benefit
            # spread, more than any competitor can justify paying.
            bid = prices[best_j] + jnp.minimum(v1 - v2, 2.0) + eps
            bids = jnp.where(unassigned, bid, -jnp.inf)
            bid_matrix = jnp.where(
                best_j[:, None] == cols[None, :], bids[:, None], -jnp.inf
            )  # (n, M)
            win_bid = jnp.max(bid_matrix, axis=0)
            win_row = jnp.argmax(bid_matrix, axis=0).astype(jnp.int32)

            # --- dummy class: its u unassigned members jointly take the u
            # cheapest not-class-owned objects, each minimally at its own
            # price + ε. (Bidding them all up to the (u+1)-th cheapest
            # would be a collective overbid: it inflates prices far beyond
            # what serial member-by-member bidding reaches — serial members
            # each settle at ~+ε because once every member owns something
            # nobody bids — and the inflated slack prices then push real
            # rows onto real columns they shouldn't take. Class-driven
            # inflation here is ≤ (m + #steals-by-reals)·ε total, which
            # folds into the N·ε optimality bound.)
            u = jnp.int32(m) - jnp.sum(owner == DUMMY)
            cand_price = jnp.where(owner == DUMMY, jnp.inf, prices)
            order = jnp.argsort(cand_price)
            rank = jnp.zeros((M,), jnp.int32).at[order].set(cols.astype(jnp.int32))
            class_bid_on = (rank < u) & (owner != DUMMY)
            class_bid = prices + eps

            # --- merge: highest bid per object wins. A real bid is always
            # ≥ prices + ε (v1 ≥ v2), so reals win ties and the class wins
            # exactly its candidates nobody real bid on.
            class_wins = class_bid_on & (class_bid > win_bid)
            real_wins = jnp.isfinite(win_bid) & ~class_wins
            owner = jnp.where(class_wins, DUMMY, jnp.where(real_wins, win_row, owner))
            prices = jnp.where(
                class_wins, class_bid, jnp.where(real_wins, win_bid, prices)
            )
            return owner, prices, it + 1

        owner, prices, _ = jax.lax.while_loop(
            cond, body, (owner, prices0, jnp.int32(0))
        )
        return prices, owner

    # geometric ε schedule 1/4 → eps_final (normalized spread is 1); prices
    # carry forward (sound because every phase ends complete), assignments
    # reset each phase
    k = jnp.arange(phases, dtype=jnp.float32) / max(phases - 1, 1)
    eps_schedule = 0.25 ** (1.0 - k) * eps_final**k

    def scan_body(prices, eps):
        prices, owner = run_phase(prices, eps)
        return prices, owner

    _, owners = jax.lax.scan(scan_body, jnp.zeros((M,), jnp.float32), eps_schedule)
    assign = assign_of(owners[-1])

    matched = (assign >= 0) & (assign < m)
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
