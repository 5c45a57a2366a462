"""Exhaustive bounded model-check of the _DELIVERED manifest-lock
protocol (``gobblin_spark/sources/datasource.py`` — the _RestWriter
commit fold-in): O_EXCL acquisition, the r13 flock-ELECTED stale-lock
reclaim, and the advice-r10 inode-identity release.

The model gives one scheduler step to each syscall the real code
performs (O_EXCL create, stat, open-pin, flock, fstat, remove — each
atomic in the kernel; the decisions between them are where the races
live), so every interleaving of three committers, crashes while
holding the lock or mid-reclaim (flock releases on crash), and mtime
aging is explored. Each committer performs the guarded
read-modify-write fold-in once.

Clock configurations: *normal* — a LIVE holder's lock never crosses
the staleness horizon (the documented assumption: the guarded section
is milliseconds against a 60 s horizon), so AGE fires only for locks
whose holder crashed (including the planted pre-crashed orphan);
*adversarial* — AGE fires anytime, modeling a critical section
overrunning the horizon.

Safety invariants:

  L1  mutual exclusion: no two committers inside the fold-in
      simultaneously;
  L2  no lost update: a fold-in write finds the manifest exactly as
      its read left it.

History this model is calibrated on — BOTH prior generations of the
reclaim violate within the same bounds, which is why the shipped
protocol is the flock election:

  unconditional_remove  advice-r9 pre-fix: a waiter that statted
                        stale deletes the PATH unconditionally — it
                        deletes the fresh lock a faster reclaimer
                        just re-acquired (L1/L2)
  rename_dance          the advice-r9 fix itself, found WRONG by this
                        model in r13 (it shipped through r12): the
                        rename still STEALS a live lock whose holder
                        re-acquired inside the stat->rename window,
                        and the rename->restore vacancy admits a
                        third committer (L1/L2). Kept in the code
                        only as the no-flock fallback, with this
                        exact residual documented.
  no_election           open-pin + fstat + verify + remove WITHOUT
                        the single-winner flock: two reclaimers of
                        the same dead inode pass verify together and
                        the second remove lands on a successor's
                        fresh lock (L1/L2)
  real + adversarial clock
                        a live section aging past the horizon IS
                        reclaimed from under its holder — inherent to
                        every heartbeat-free staleness protocol; the
                        checker finds it, confirming the 60 s
                        assumption is load-bearing (and why r13 made
                        acquisition wait the horizon out instead of
                        giving up at 5 s).

The shipped protocol (flock election) is clean under the normal
clock: the elected reclaimer is the only agent that ever unlinks the
pinned inode, a live fresh holder is left untouched by the fstat
check, and creators need a vacancy — so the verify->remove pair
cannot hit a fresh lock.
"""

from collections import deque

import pytest

# committer phases
(TRY, STAT, OPEN, ELECT, FSTAT, VERIFY, REMOVE,
 RENAME, RESTAT, RESTORE_LINK, RESTORE_RM, RMCLAIM, UREMOVE,
 SEC_READ, SEC_WRITE, REL_STAT, REL_RM) = range(17)

N = 3                      # committers; each folds in exactly once
ORPHAN = 0                 # inode id of the planted crashed lock


class Violation(Exception):
    pass


def step(state, slot, bug):
    """Advance committer *slot* one syscall. state = (path, claims,
    elected, ages, dead, manifest, cons): path = inode|None at the
    lock path; claims = ((slot, inode), ...) rename-dance temps;
    elected = ((inode, slot), ...) live flocks; ages = frozenset of
    STALE inodes; dead = frozenset of crashed slots; manifest =
    folded count; cons = per-committer phase tuples."""
    path, claims, elected, ages, dead, manifest, cons = state
    c = cons[slot]
    phase = c[0]
    my_ino = slot + 1          # each committer creates at most once

    def put(newc, path=path, claims=claims, elected=elected,
            manifest=manifest):
        cs = list(cons)
        cs[slot] = newc
        return [(path, claims, elected, ages, dead, manifest,
                 tuple(cs))]

    def unelect(ino):
        return tuple(e for e in elected if e != (ino, slot))

    if phase == TRY:
        if path is None:
            # O_EXCL create: fresh inode, we hold the fd
            others = sum(1 for i, o in enumerate(cons)
                         if i != slot and o[0] in (SEC_READ, SEC_WRITE))
            if others:
                raise Violation(
                    "L1: two committers inside the guarded fold-in")
            return put((SEC_READ,), path=my_ino)
        return put((STAT,))

    if phase == STAT:
        if path is None or path not in ages:
            return put((TRY,))          # vanished / fresh live holder
        if bug == "unconditional_remove":
            return put((UREMOVE,))
        if bug == "rename_dance":
            return put((RENAME,))
        return put((OPEN,))

    # ---- shipped protocol: flock-elected reclaim --------------------
    if phase == OPEN:
        if path is None:
            return put((TRY,))          # FileNotFoundError
        return put((ELECT, path))       # fd pins this inode

    if phase == ELECT:
        _, ino = c
        if bug != "no_election":
            if any(e[0] == ino and e[1] != slot for e in elected):
                return put((TRY,))      # lost: close fd, wait
            return put((FSTAT, ino), elected=elected + ((ino, slot),))
        return put((FSTAT, ino))

    if phase == FSTAT:
        _, ino = c
        if ino not in ages:             # pinned inode is FRESH: a
            return put((TRY,), elected=unelect(ino))  # live holder
        return put((VERIFY, ino))

    if phase == VERIFY:
        _, ino = c
        if path != ino:
            return put((TRY,), elected=unelect(ino))
        return put((REMOVE, ino))

    if phase == REMOVE:
        _, ino = c
        # os.remove(lock): removes the CURRENT path entry (the model
        # proves this can only be the pinned inode in the shipped
        # protocol; in no_election it can hit a successor's lock)
        return put((TRY,), path=None, elected=unelect(ino))

    # ---- historical variants ---------------------------------------
    if phase == UREMOVE:
        return put((TRY,), path=None)

    if phase == RENAME:
        if path is None:
            return put((TRY,))          # OSError: lost the race
        return put((RESTAT, path), path=None,
                   claims=claims + ((slot, path),))

    if phase == RESTAT:
        _, ino = c
        if ino in ages:
            return put((RMCLAIM, ino))
        return put((RESTORE_LINK, ino))

    if phase == RESTORE_LINK:
        _, ino = c
        if path is None:
            return put((RESTORE_RM, ino), path=ino)
        return put((RESTORE_RM, ino))   # EEXIST: another waiter filled

    if phase == RESTORE_RM or phase == RMCLAIM:
        _, ino = c
        return put((TRY,),
                   claims=tuple(cl for cl in claims
                                if cl != (slot, ino)))

    # ---- the guarded section and the identity release ---------------
    if phase == SEC_READ:
        return put((SEC_WRITE, manifest))

    if phase == SEC_WRITE:
        _, m = c
        if manifest != m:
            raise Violation(
                f"L2: fold-in lost an update (read {m}, manifest now "
                f"{manifest})")
        return put((REL_STAT,), manifest=m + 1)

    if phase == REL_STAT:
        # advice-r10: remove only when the path still resolves to OUR
        # inode (fd-pinned identity)
        if path == my_ino:
            return put((REL_RM,))
        return put(("DONE",))

    if phase == REL_RM:
        return put(("DONE",), path=None)

    return []      # DONE / DEAD


def crash_steps(state, slot):
    """A committer may die holding the lock, mid-reclaim (its flock
    releases with the fd), or mid-dance (its claim stays orphaned);
    its created inode then becomes AGE-eligible (normal clock)."""
    path, claims, elected, ages, dead, manifest, cons = state
    c = cons[slot]
    if c[0] in (SEC_READ, SEC_WRITE, REL_STAT, REL_RM,
                ELECT, FSTAT, VERIFY, REMOVE,
                RESTAT, RESTORE_LINK, RESTORE_RM, RMCLAIM):
        cs = list(cons)
        cs[slot] = ("DEAD",)
        nel = tuple(e for e in elected if e[1] != slot)
        return [(path, claims, nel, ages, dead | {slot}, manifest,
                 tuple(cs))]
    return []


def explore(bug=None, adversarial_clock=False, planted_orphan=True,
            max_states=3_000_000):
    """BFS over every interleaving. Returns (states, violation)."""
    init_path = ORPHAN if planted_orphan else None
    init_ages = frozenset({ORPHAN}) if planted_orphan else frozenset()
    init = (init_path, (), (), init_ages, frozenset(),
            0, tuple((TRY,) for _ in range(N)))
    seen = {init}
    q = deque([init])
    while q:
        state = q.popleft()
        path, claims, elected, ages, dead, manifest, cons = state
        succs = []
        # clock: AGE a fresh inode (normal: only crashed creators')
        live_inos = {path} | {i for _, i in claims}
        for ino in live_inos:
            if ino is None or ino in ages:
                continue
            creator = ino - 1          # my_ino = slot + 1
            if not adversarial_clock and creator not in dead:
                continue
            succs.append((path, claims, elected, ages | {ino}, dead,
                          manifest, cons))
        for slot in range(N):
            try:
                succs.extend(step(state, slot, bug))
            except Violation as v:
                return len(seen), str(v)
            succs.extend(crash_steps(state, slot))
        for s in succs:
            if s not in seen:
                seen.add(s)
                if len(seen) > max_states:
                    raise RuntimeError("state space exceeded")
                q.append(s)
    return len(seen), None


@pytest.mark.parametrize("planted", [True, False])
def test_lock_protocol_holds_under_all_interleavings(planted):
    """The shipped protocol (flock-elected reclaim) under the normal
    clock: no interleaving of three committers — crashes while
    holding the lock or mid-election, a planted pre-crashed orphan
    lock, aggressive aging of dead holders' locks — breaks mutual
    exclusion or loses a fold-in update."""
    states, violation = explore(planted_orphan=planted)
    assert violation is None, violation
    assert states > 1_000


@pytest.mark.parametrize("bug", [
    "unconditional_remove",      # advice-r9 pre-fix
    "rename_dance",              # advice-r9 fix, disproved in r13
    "no_election",               # pin+verify without the flock
])
def test_checker_finds_each_known_bug(bug):
    """Calibration: both historical generations of the reclaim AND an
    election-less variant of the new one each break mutual exclusion
    within the same bounds — the clean result above is evidence, not
    vacuity."""
    states, violation = explore(bug=bug)
    assert violation is not None, \
        f"{bug}: no violation found in {states} states"
    assert violation.startswith("L"), violation


def test_adversarial_clock_residual_is_real():
    """A live critical section aging past the staleness horizon IS
    reclaimed from under its holder — inherent to every
    heartbeat-free staleness protocol. The checker finds the mutual
    exclusion break, confirming the documented 60 s assumption is
    load-bearing (the r13 wait-out-the-horizon acquisition and the
    advice-r10 identity release bound the damage; they cannot
    eliminate it)."""
    states, violation = explore(adversarial_clock=True)
    assert violation is not None and violation.startswith("L"), \
        f"residual not found in {states} states"
