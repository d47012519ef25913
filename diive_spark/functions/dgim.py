"""DGIM sliding-window bit counting (Datar, Gionis, Indyk & Motwani,
"Maintaining stream statistics over sliding windows", SIAM J. Comput.
2002): approximate count of 1s among the last W positions of a bit
stream using O(log² W) space — the classic bounded-memory answer to
"how many events above threshold in the trailing window" when the
window is too wide to buffer.

Buckets are (timestamp-of-most-recent-1, size) pairs, newest first;
sizes are powers of two with at most ``MAX_PER_SIZE`` buckets per size
(the classic variant: 2).  The estimate counts every complete bucket
plus HALF the oldest (rounded up); the only uncertainty is how much of
the oldest bucket is still inside the window, so the error is provably
at most floor(oldest_size / 2) — an exact per-query bound the engine
checks in-query, not a probabilistic one.

This fold is pure integer Python shared BIT-FOR-BIT by the batch
kernel (``operators.analyses.dgim_window_count``) and the streaming
partials (``streaming.stateful.stream_dgim_partials``): identical
arithmetic means micro-batch slicing and checkpoint restarts cannot
drift from the batch answer.
"""

from __future__ import annotations

MAX_PER_SIZE = 2


def dgim_add(
    pos: int, bit: int, bpos: list, bsiz: list, window: int
) -> None:
    """Advance the sketch to ``pos`` with the given bit (in place).

    ``bpos``/``bsiz`` hold the buckets newest-first.  A bucket expires
    when its timestamp leaves the window (pos - window, pos]; a new 1
    opens a size-1 bucket and cascading merges combine the two OLDEST
    buckets of any over-populated size (merged timestamp = the newer
    of the two, i.e. the surviving more-recent bucket keeps its own).
    """
    cut = pos - window
    while bpos and bpos[-1] <= cut:
        bpos.pop()
        bsiz.pop()
    if not bit:
        return
    bpos.insert(0, pos)
    bsiz.insert(0, 1)
    s = 1
    while True:
        idxs = [j for j, sz in enumerate(bsiz) if sz == s]
        if len(idxs) <= MAX_PER_SIZE:
            return
        j_old, j_new = idxs[-1], idxs[-2]  # the two oldest of size s
        bsiz[j_new] = 2 * s
        del bpos[j_old]
        del bsiz[j_old]
        s *= 2


def dgim_estimate(bpos: list, bsiz: list) -> tuple:
    """(estimate, exact_error_bound) for the current window.

    All buckets except the oldest are entirely inside the window; the
    oldest contributes ceil(size/2) with true contribution somewhere in
    [1, size] (its timestamp is in-window, so at least one of its 1s
    is).  Hence |estimate - truth| <= floor(size_oldest / 2), an exact
    deterministic bound (0 when the oldest bucket has size 1).
    """
    if not bpos:
        return 0, 0
    rest = sum(bsiz[:-1])
    old = bsiz[-1]
    return rest + (old + 1) // 2, old // 2


def max_buckets(window: int) -> int:
    """Upper bound on live bucket count: MAX_PER_SIZE per power-of-two
    size up to the window width, plus two guard sizes for buckets
    formed just before their tail expires."""
    n_sizes = max(1, window).bit_length()
    return MAX_PER_SIZE * (n_sizes + 2)
