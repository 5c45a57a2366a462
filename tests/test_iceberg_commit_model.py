"""Exhaustive bounded model-check of the Iceberg HadoopTables commit
protocol as implemented in ``gobblin_spark/sinks/iceberg.py``
(r13 hardening): the version-file claim (link(2) primary / O_EXCL
fallback), the hint-flips-last rule, and the ``_fast_forward`` probe
that adopts complete version files past a stale or regressed hint.

The model is a pure-Python abstraction with atomicity exactly where
the real filesystem operations are atomic: the link/O_EXCL claim, the
payload completion, and the hint overwrite are each one scheduler
step, so every crash point (before the claim, inside the O_EXCL
create->write gap, between the claim and the hint flip) and every
flip reordering is an explored interleaving. Committers claim
base+1 from a probed read and re-read on collision — the real
``_commit_files`` retry; a dedicated READER agent tracks the version
it last adopted.

Safety invariants:

  I2  reader monotonicity: a reader never adopts an OLDER version
      than it already served (stale/regressed hints must be healed
      by the probe, not surfaced);
  I3  progress on collision: when a claim collides with a COMPLETE
      version file, the committer's fresh read adopts at least that
      version — a durable commit can never permanently wedge later
      committers (the crashed-before-flip shape);
  W   no torn wedge: a claim never collides with a TORN final. On
      the link(2) path this is structural (a crash leaves either
      nothing or a complete file); on the O_EXCL fallback it is the
      DOCUMENTED residual — the checker finds it there, confirming
      both the comment and that the probe correctly refuses to adopt
      the junk (excl mode stays clean on I2/I3 when the wedge is
      allowed to halt the committer, which is what the real claim's
      named junk diagnosis does).

Calibrated on the pre-r13 protocol (no probe: readers and committers
trust the hint alone): a committer crashing between claim and flip
wedges every later commit (violates I3), and probing committers with
a hint-only reader expose hint regression (two flips landing out of
order; violates I2)."""

from collections import deque

import pytest

MAXV = 4
READ, CLAIM, FINISH, FLIP = range(4)


class Violation(Exception):
    pass


def _probe(hint, files):
    """_fast_forward: adopt contiguous COMPLETE versions past the
    hint; refuse torn files."""
    v = hint
    while v < len(files) and files[v][0] == "OK":
        v += 1
    return v


def _read(hint, files, probe):
    return _probe(hint, files) if probe else hint


def step_committer(state, slot, mode, probe, allow_wedge):
    files, hint, cons, reader = state
    c = cons[slot]
    phase = c[0]

    def put(newc, files=files, hint=hint):
        cs = list(cons)
        cs[slot] = newc
        return [(files, hint, tuple(cs), reader)]

    if phase == READ:
        v = _read(hint, files, probe)
        if v + 1 > MAXV:
            return put(("DONE",))
        return put((CLAIM, v + 1))

    if phase == CLAIM:
        _, target = c
        if target <= len(files):                 # collision
            collider = files[target - 1]
            if collider[0] == "TORN":
                if allow_wedge:
                    # the real claim raises the named junk diagnosis
                    # and does not retry — the committer halts
                    return put(("WEDGED",))
                raise Violation(
                    f"W: claim at v{target} collided with a torn "
                    "final — wedge reachable on this claim path")
            rv = _read(hint, files, probe)
            if rv < target:
                raise Violation(
                    f"I3: collided with COMPLETE v{target} but the "
                    f"fresh read still adopts v{rv} — a durable "
                    "commit permanently wedges later committers")
            return put((READ,))                  # re-plan from fresh
        if mode == "link":
            nf = files + (("OK", slot),)
            return put((FLIP, target), files=nf)
        # O_EXCL: the create->write gap — either the payload lands
        # (FINISH pending) or the writer dies leaving a torn final
        alive = put((FINISH, target), files=files + (("TORN",),))
        dead = put(("DEAD",), files=files + (("TORN",),))
        return alive + dead

    if phase == FINISH:
        _, target = c
        nf = list(files)
        nf[target - 1] = ("OK", slot)
        return put((FLIP, target), files=tuple(nf))

    if phase == FLIP:
        _, target = c
        # the real code writes str(v) unconditionally — a delayed
        # flip can REGRESS the hint; the probe must heal it
        return put(("DONE",), hint=target)

    return []        # DONE / DEAD / WEDGED


def step_reader(state, probe):
    files, hint, cons, last = state
    v = _read(hint, files, probe)
    if v < last:
        raise Violation(
            f"I2: reader adopted v{v} after already serving v{last} "
            "— a regressed hint surfaced to readers")
    if v == last:
        return []
    return [(files, hint, cons, v)]


def explore(n_committers=3, mode="link", probe=True,
            reader_probe=None, allow_wedge=False,
            max_states=2_000_000):
    """BFS over every interleaving. Returns (states, violation)."""
    reader_probe = probe if reader_probe is None else reader_probe
    init = ((), 0, tuple((READ,) for _ in range(n_committers)), 0)
    seen = {init}
    q = deque([init])
    while q:
        state = q.popleft()
        succs = []
        for slot in range(n_committers):
            try:
                succs.extend(step_committer(
                    state, slot, mode, probe, allow_wedge))
            except Violation as v:
                return len(seen), str(v)
        try:
            succs.extend(step_reader(state, reader_probe))
        except Violation as v:
            return len(seen), str(v)
        for s in succs:
            if s not in seen:
                seen.add(s)
                if len(seen) > max_states:
                    raise RuntimeError("state space exceeded")
                q.append(s)
    return len(seen), None


def test_link_claim_with_probe_holds_under_all_interleavings():
    """The shipped protocol on the link(2) path: no interleaving of
    three committers (crashes anywhere, flips arbitrarily delayed and
    reordered) and a concurrent reader violates reader monotonicity,
    progress-on-collision, or the no-torn-wedge property."""
    states, violation = explore(n_committers=4, mode="link",
                                probe=True)
    assert violation is None, violation
    assert states > 1_000


def test_excl_fallback_torn_wedge_is_real_and_contained():
    """The O_EXCL fallback: the checker FINDS the documented torn
    wedge (a crash inside the create->write gap leaves junk every
    later claim collides with), and with the wedge halting the
    committer — the real claim's named junk diagnosis — everything
    else stays clean: the probe never adopts the junk and readers
    never regress."""
    states, violation = explore(mode="excl", probe=True,
                                allow_wedge=False)
    assert violation is not None and violation.startswith("W"), violation
    states, violation = explore(mode="excl", probe=True,
                                allow_wedge=True)
    assert violation is None, violation
    assert states > 1_000


def test_checker_finds_the_pre_probe_wedge():
    """Calibration (the pre-r13 protocol): with readers and committers
    trusting the hint alone, a committer crashing between the claim
    and the flip leaves a complete version the hint never reaches —
    every later commit collides forever (I3)."""
    states, violation = explore(mode="link", probe=False)
    assert violation is not None and violation.startswith("I3"), \
        f"no violation in {states} states"


def test_checker_finds_hint_regression_for_probeless_readers():
    """Calibration: two committers' hint flips landing out of order
    REGRESS the hint; a reader that trusts the hint alone serves an
    older table version after a newer one (I2). The probe heals this
    (the clean run above includes the same flip reorderings)."""
    states, violation = explore(mode="link", probe=True,
                                reader_probe=False)
    assert violation is not None and violation.startswith("I2"), \
        f"no violation in {states} states"
