"""Exhaustive bounded model-check of the schema registry's version
claim protocol (``gobblin_spark/sources/registry.py`` —
``FileSchemaRegistry.register``): an independent adversarial read of
the single-winner claim, the per-retry idempotent/compat rescan, and
the O_EXCL fallback's young-torn wall-time grace.

The model is a faithful pure-Python abstraction of the protocol's
SHARED-STATE steps, each atomic exactly where the real code's
filesystem operations are atomic (listdir snapshot, link(2)/O_EXCL
create, the per-file write). Per-file reads inside one scan are
collapsed into an atomic snapshot: version files only ever transition
absent -> torn -> complete, each transition is its own scheduler step,
and a stale torn read re-enters the grace loop via the fresh-mtime
stat, so the snapshot abstraction does not hide the create/finish
races (which the CREATE/FINISH interleavings model directly).

Writer protocol (each registrant holds one fixed schema):

    SCAN    atomic snapshot of the subject dir; if any torn file is
            YOUNG -> wait (grace beat; the step yields no successor
            until the environment moves); else the idempotent fast
            path (my sid complete anywhere -> return), the backward-
            compat gate against the newest COMPLETE version, and the
            next-version computation over ALL files (torn burn
            versions)
    CLAIM   link(2) mode: the fully-written payload appears atomically
            or EEXIST -> rescan.  O_EXCL mode: the canonical name is
            created TORN (the create->write gap), then FINISH
            completes it — or the writer dies and the file stays torn
            forever (version burned)
    FINISH  the payload lands; the claim is durable

Environment actions: AGE flips a young torn file to old (wall time
passing).  Two clock configurations: *grace-respecting* — a live
writer's create->write gap never outlasts TORN_GRACE_SEC, so AGE is
enabled only for files whose writer crashed (the assumption the
production grace constant encodes); *unrestricted* — AGE fires
anytime, modeling a write that outlasts the grace.

Safety invariants, checked at every file completion / success return:

  R1  single winner: no two register() calls ever both return success
      for the same version;
  R2  the compat chain holds: consecutive COMPLETE versions are
      pairwise backward-compatible (the gate every successful claim
      is supposed to have re-verified against the real latest);
  R3  no duplicate sid: the idempotent fast path means one schema is
      never registered at two versions.

Calibrated on the protocol's own bug history — each known-broken
variant violates an invariant within the same bounds, so the clean
result for the shipped protocol is evidence, not vacuity:

  list_after_write  the r12 protocol (write vN-<uuid>, list, smallest
                    path wins): two racers can each see themselves
                    smallest and both return success (violates R1)
  no_rescan         the r12 retry loop never re-ran the idempotent
                    fast path: a loser re-registers the sid a racer
                    just claimed (violates R3)
  no_grace          torn files treated as never-happened immediately:
                    a mid-write O_EXCL racer's sid is duplicated / its
                    compat gate skipped by a scanner inside the
                    create->write gap (violates R3/R2)
  one_rescan        the first-cut r13 grace (one extra scan, bounded
                    by scan speed, not wall time): the grace expires
                    while the racer is still mid-write (violates R3)
  real + unrestricted clock
                    the DOCUMENTED O_EXCL residual (registry.py, the
                    fallback comment): a write outlasting the grace is
                    treated as crashed — the checker FINDS it, so the
                    documentation names a real boundary, and only the
                    atomic link(2) claim is residual-free (verified
                    clean under the same unrestricted clock).
"""

from collections import deque

import pytest

MAXV = 4                 # versions available before a writer gives up

# writer phases
SCAN, CLAIM, FINISH = range(3)
# terminal phases: ("WON", v) ("IDEM",) ("REJ",) ("GIVEUP",) ("DEAD",)

# schema universes: sid -> per-writer; COMPAT[new][old]
DUP = ("A", "B", "B")            # two registrants of the same schema
CHAIN = ("A", "B", "C")          # the gate must catch C landing on B
FULL = ("A", "B", "B", "C")      # both shapes at once, 4-way race
COMPAT_ALL = {(n, o): True for n in "ABC" for o in "ABC"}
COMPAT_CHAIN = dict(COMPAT_ALL)
COMPAT_CHAIN[("C", "B")] = False


class Violation(Exception):
    pass


def _complete(files):
    return sorted((v, p[1]) for v, _, p in files if p[0] == "OK")


def _check_files(files, compat):
    comp = _complete(files)
    for (v_lo, s_lo), (v_hi, s_hi) in zip(comp, comp[1:]):
        if not compat[(s_hi, s_lo)]:
            raise Violation(
                f"R2: complete versions v{v_lo}={s_lo} and v{v_hi}="
                f"{s_hi} are consecutive but incompatible — the "
                "compat gate was skipped")
    sids = [s for _, s in comp]
    if len(sids) != len(set(sids)):
        raise Violation(
            f"R3: duplicate sid across complete versions ({comp}) — "
            "the idempotent fast path was bypassed")


def step_writer(state, slot, sids, compat, bug, atomic_link):
    """Advance writer *slot* one protocol step. Returns successor
    states; raises Violation when an invariant breaks."""
    files, writers = state
    w = writers[slot]
    phase = w[0]
    sid = sids[slot]

    def put(neww, files=files):
        ws = list(writers)
        ws[slot] = neww
        return [(files, tuple(ws))]

    if phase == SCAN:
        graced = w[1]
        torn_young = [(v, p) for v, _, p in files
                      if p[0] == "TORN" and p[1]]
        if bug == "no_grace":
            torn_young = []
        elif bug == "one_rescan":
            # first-cut r13 grace: bounded by scan count, not wall
            # time — after one graced rescan, young torn files are
            # treated as dead like old ones
            if graced >= 1:
                torn_young = []
            elif torn_young:
                return put((SCAN, graced + 1))
        if torn_young:
            return []        # grace beat: wait for FINISH or AGE
        comp = _complete(files)
        if any(s == sid for _, s in comp) and bug != "no_rescan":
            return put(("IDEM",))
        if bug == "no_rescan" and graced == 0 and \
                any(s == sid for _, s in comp):
            # the r12 fast path DID run once, before the first claim
            return put(("IDEM",))
        latest = comp[-1][1] if comp else None
        if latest is not None and not compat[(sid, latest)]:
            return put(("REJ",))
        v = max((v for v, _, _ in files), default=0) + 1
        if v > MAXV:
            return put(("GIVEUP",))
        return put((CLAIM, v, graced))

    if phase == CLAIM:
        _, v, graced = w
        if bug == "list_after_write":
            # r12: write vN-<rank> unconditionally (rank = slot; a
            # racer writing later with a smaller rank takes the
            # smallest path), then the separate list-check decides
            nf = tuple(sorted(files + ((v, slot, ("OK", sid)),)))
            _check_files(nf, compat)
            return put(("LISTCHK", v), files=nf)
        if any(fv == v for fv, _, _ in files):
            # lost the version race: retry from a fresh scan; a lost
            # race resets nothing else (the real loop re-lists)
            return put((SCAN, 1 if bug == "no_rescan" else graced))
        if atomic_link:
            nf = tuple(sorted(files + ((v, 0, ("OK", sid)),)))
            _check_files(nf, compat)
            return _won(put, writers, slot, v, nf)
        # O_EXCL fallback: the canonical name appears TORN; the writer
        # either proceeds to FINISH or dies inside the gap (version
        # burned, file torn forever — owner_dead gates the clock)
        alive = tuple(sorted(files + ((v, 0, ("TORN", True, False)),)))
        dead = tuple(sorted(files + ((v, 0, ("TORN", True, True)),)))
        return (put((FINISH, v, graced), files=alive)
                + put(("DEAD",), files=dead))

    if phase == FINISH:
        _, v, graced = w
        nf = tuple(sorted(
            ((fv, r, ("OK", sid)) if fv == v and p[0] == "TORN" else
             (fv, r, p)) for fv, r, p in files))
        _check_files(nf, compat)
        return _won(put, writers, slot, v, nf)

    if phase == "LISTCHK":
        _, v = w
        ranks = [r for fv, r, _ in files if fv == v]
        if min(ranks) == slot:
            return _won(put, writers, slot, v, files)
        return put((SCAN, 0))

    return []        # terminal


def _won(put, writers, slot, v, files):
    for i, w in enumerate(writers):
        if i != slot and w[0] == "WON" and w[1] == v:
            raise Violation(
                f"R1: writers {i} and {slot} both returned success "
                f"for version {v} — two winners of one claim")
    return put(("WON", v), files=files)


def explore(sids, compat, bug=None, atomic_link=False,
            grace_clock=True, max_states=3_000_000):
    """BFS over every interleaving of the writers and the clock.
    Returns (states_visited, violation message or None)."""
    init = ((), tuple((SCAN, 0) for _ in sids))
    seen = {init}
    q = deque([init])
    while q:
        state = q.popleft()
        files, writers = state
        succs = []
        for i, (v, r, p) in enumerate(files):       # clock: AGE a young
            if p[0] == "TORN" and p[1]:             # torn file
                if grace_clock and not p[2]:
                    continue    # live writer finishes within the grace
                nf = list(files)
                nf[i] = (v, r, ("TORN", False, p[2]))
                succs.append((tuple(nf), writers))
        for slot in range(len(writers)):
            try:
                succs.extend(step_writer(
                    state, slot, sids, compat, bug, atomic_link))
            except Violation as viol:
                return len(seen), str(viol)
        for s in succs:
            if s not in seen:
                seen.add(s)
                if len(seen) > max_states:
                    raise RuntimeError("state space exceeded")
                q.append(s)
    return len(seen), None


@pytest.mark.parametrize("sids,compat", [(DUP, COMPAT_ALL),
                                         (CHAIN, COMPAT_CHAIN),
                                         (FULL, COMPAT_CHAIN)])
def test_atomic_link_claim_holds_even_under_unrestricted_clock(
        sids, compat):
    """The PRIMARY claim path — link(2) of a fully-written payload —
    admits no torn state at all: single-winner, compat-chain and
    idempotency hold under every interleaving with NO clock
    assumption (the residual the fallback documents does not exist
    here)."""
    states, violation = explore(sids, compat, atomic_link=True,
                                grace_clock=False)
    assert violation is None, violation
    # atomic claims admit no torn interleavings, so this space is
    # genuinely small — the floor only guards that the search ran
    assert states > 40


@pytest.mark.parametrize("sids,compat", [(DUP, COMPAT_ALL),
                                         (CHAIN, COMPAT_CHAIN),
                                         (FULL, COMPAT_CHAIN)])
def test_excl_fallback_holds_under_grace_respecting_clock(sids, compat):
    """The O_EXCL fallback with the wall-time young-torn grace: under
    the clock assumption the grace constant encodes (a live writer's
    create->write gap never outlasts TORN_GRACE_SEC), no interleaving
    of the registrants — crashes inside the gap, burned versions,
    aged corpses included — violates R1/R2/R3. The FULL universe
    races a duplicate-sid pair AND an incompatible chain writer
    four ways at once."""
    states, violation = explore(sids, compat, atomic_link=False,
                                grace_clock=True)
    assert violation is None, violation
    assert states > 100          # the search actually explored


@pytest.mark.parametrize("sids,compat,bug,atomic_link,grace,inv", [
    (CHAIN, COMPAT_ALL, "list_after_write", False, True, "R1"),
    (DUP, COMPAT_ALL, "no_rescan", True, True, "R3"),
    (DUP, COMPAT_ALL, "no_grace", False, True, "R3"),
    (CHAIN, COMPAT_CHAIN, "no_grace", False, True, "R2"),
    (DUP, COMPAT_ALL, "one_rescan", False, True, "R3"),
])
def test_checker_finds_each_known_bug(sids, compat, bug, atomic_link,
                                      grace, inv):
    """Calibration: every historical protocol variant (the r12
    list-after-write tiebreak, the r12 missing fast-path rescan, the
    pre-grace torn handling, the first-cut scan-count grace) violates
    an invariant within the same bounds."""
    states, violation = explore(sids, compat, bug=bug,
                                atomic_link=atomic_link,
                                grace_clock=grace)
    assert violation is not None, \
        f"{bug}: no violation found in {states} states"
    assert violation.startswith(inv), violation


@pytest.mark.parametrize("sids,compat,inv", [
    (DUP, COMPAT_ALL, "R3"),
    (CHAIN, COMPAT_CHAIN, "R2"),
])
def test_documented_excl_residual_is_real(sids, compat, inv):
    """The fallback's comment documents a RESIDUAL race the grace only
    narrows: a write outlasting TORN_GRACE_SEC is treated as crashed,
    so a racer can duplicate its sid or skip the compat gate against
    its eventually-landing schema. Under an unrestricted clock the
    checker finds exactly that violation — the documentation names a
    real boundary (and the link(2) test above shows the primary path
    is free of it)."""
    states, violation = explore(sids, compat, atomic_link=False,
                                grace_clock=False)
    assert violation is not None, \
        f"residual not found in {states} states"
    assert violation.startswith(inv), violation
