"""Stateful fuzz of the generation protocol's metadata plane (round 10).

A hypothesis rule-based state machine drives random interleavings of
publish / set-branch / merge / delete-branch / GC / expiry / torn-state
planting / same-args resume against one index directory, and checks the
durability INVARIANTS the whole lakehouse tier rests on after every
step:

- the manifest head's directory always exists and keeps its content;
- every branch-referenced generation's directory exists;
- every name on the manifest's ``retained`` list exists;
- GC and expiry never name a head / branch-ref / retained entry in
  their removal reports, and a second GC right after a first removes
  nothing (re-entrancy).

Everything here is pure file/metadata work (publish_generation renames
a staged dir; no DataFrames), so hundreds of protocol interleavings run
in seconds — the deterministic twin of a soak test. The Spark-side
halves (checkpoint compaction, serving scans) are covered by the
pipeline/streaming suites; this file is about COMMIT-PLANE safety.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    rule,
)

from dask_pipes_spark.session import (
    CommitConflictError,
    checkpoint_index_generations,
    compact_manifest,
    delete_branch,
    expire_snapshots,
    gc_index_dir,
    merge_branch,
    publish_generation,
    set_branch,
)


def _read_manifest(d: str) -> tuple[list, list]:
    p = os.path.join(d, "VACUUM.json")
    if not os.path.exists(p):
        return [], []
    m = json.load(open(p))
    return m.get("history", []), m.get("retained", [])


def _read_branches(d: str) -> dict:
    p = os.path.join(d, "BRANCHES.json")
    return json.load(open(p)) if os.path.exists(p) else {}


class GenerationProtocol(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self._just_compacted = False
        self.dir = tempfile.mkdtemp(prefix="dps_fuzz_")
        self.ngen = 0
        self.published: list[str] = []  # every generation ever committed

    def teardown(self):
        shutil.rmtree(self.dir, ignore_errors=True)

    # --- helpers -----------------------------------------------------------

    def _head(self) -> str | None:
        hist, _ = _read_manifest(self.dir)
        return hist[-1]["by"] if hist else None

    def _stage(self, name: str) -> str:
        staged = os.path.join(self.dir, f"{name}.staged")
        os.makedirs(staged, exist_ok=True)
        # content marker: proves later that nothing rewrote the data
        open(os.path.join(staged, "DATA"), "w").write(name)
        return staged

    # --- rules -------------------------------------------------------------

    @initialize()
    def init_first_generation(self):
        self.ngen = 1
        publish_generation(
            self.dir, self._stage("g001"), "g001", superseded=[]
        )
        self.published.append("g001")
        set_branch(self.dir, "main", "g001")

    @rule(
        retain=st.integers(0, 2),
        supersede_head=st.booleans(),
        to_branch=st.booleans(),
        use_cas=st.booleans(),
    )
    def publish(self, retain, supersede_head, to_branch, use_cas):
        self._just_compacted = False
        self.ngen += 1
        name = f"g{self.ngen:03d}"
        head = self._head()
        superseded = [head] if (supersede_head and head) else []
        publish_generation(
            self.dir,
            self._stage(name),
            name,
            superseded=superseded,
            retain=retain,
            expected_head=head if use_cas else None,
            branch="audit" if to_branch else None,
        )
        self.published.append(name)

    @rule(
        retain=st.integers(0, 2),
        supersede_head=st.booleans(),
        n=st.integers(2, 5),
    )
    def publish_atomic_ntable(self, retain, supersede_head, n):
        """Round 11 (pairs) / round 12 (N up to 5 — the l85 retrain
        shape): N tables commit under ONE history link via
        checkpoint_index_generations — durable tmps staged by hand (the
        _SUCCESS marker is the durability contract), no Spark needed."""
        self._just_compacted = False
        head = self._head()
        superseded = [head] if (supersede_head and head) else []
        self.ngen += 1
        names = [
            f"g{self.ngen:03d}-{chr(ord('a') + j)}" for j in range(n)
        ]
        moves = []
        for j, nm in enumerate(names):
            tmp = os.path.join(self.dir, nm + ".tmp")
            os.makedirs(tmp, exist_ok=True)
            open(os.path.join(tmp, "_SUCCESS"), "w").close()
            open(os.path.join(tmp, "DATA"), "w").write(nm)
            moves.append((None, superseded if j == 0 else [], nm))
        checkpoint_index_generations(self.dir, moves, retain=retain)
        self.published.extend(names)

    @rule(keep_tail=st.integers(1, 4))
    def compact(self, keep_tail):
        """Round 11: folding inert history prefix links must never change
        heads, retained durability, GC decisions, or resume outcomes —
        all existing invariants run across it."""
        compact_manifest(self.dir, keep_tail=keep_tail)

        self._just_compacted = True

    @rule()
    def stale_cas_refused(self):
        """A publish expecting a head that never existed must refuse
        BEFORE any rename, leaving the staged bytes intact."""
        name = f"g{self.ngen + 1:03d}.cas-probe"
        staged = self._stage(name)
        try:
            publish_generation(
                self.dir, staged, name, superseded=[],
                expected_head="never-existed",
            )
            raise AssertionError("stale CAS must refuse")
        except CommitConflictError:
            pass
        assert os.path.isdir(staged), "loser's staged bytes must survive"
        shutil.rmtree(staged, ignore_errors=True)

    @rule(data=st.data())
    def point_branch(self, data):
        existing = [
            g for g in self.published
            if os.path.isdir(os.path.join(self.dir, g))
        ]
        if not existing:
            return
        gen = data.draw(st.sampled_from(existing))
        branch = data.draw(st.sampled_from(["audit", "pin", "eval"]))
        set_branch(self.dir, branch, gen)

    @rule(retain=st.integers(0, 2))
    def merge_audit_to_main(self, retain):
        self._just_compacted = False
        branches = _read_branches(self.dir)
        if "audit" not in branches:
            return
        merge_branch(
            self.dir, "audit", "main",
            expected_head=branches.get("main"), retain=retain,
        )

    @rule(branch=st.sampled_from(["audit", "pin", "eval", "main"]))
    def retire_branch(self, branch):
        self._just_compacted = False
        # "main" included (round 11): deleting the serving ref exercises
        # the no-distinct-anchor path — the link must anchor at a durable
        # prior head or be skipped, never self-supersede (advice item)
        delete_branch(self.dir, branch)

    @rule()
    def plant_torn_debris_then_gc(self):
        """Debris from a simulated kill must be removable without
        touching live state."""
        os.makedirs(
            os.path.join(self.dir, f"g{self.ngen:03d}.tmp"), exist_ok=True
        )
        os.makedirs(
            os.path.join(self.dir, "gXXX.staged-crashed"), exist_ok=True
        )
        gc_index_dir(self.dir, older_than_sec=0)
        assert not os.path.isdir(
            os.path.join(self.dir, "gXXX.staged-crashed")
        )

    @rule()
    def gc_is_reentrant(self):
        gc_index_dir(self.dir, older_than_sec=0)
        rep2 = gc_index_dir(self.dir, older_than_sec=0)
        assert rep2["removed"] == [], rep2

    @rule(keep_last=st.integers(0, 2))
    def expire_old_snapshots(self, keep_last):
        self._just_compacted = False
        expire_snapshots(self.dir, older_than_sec=0, keep_last=keep_last)

    @rule(keep_last=st.integers(0, 2), keep_tail=st.integers(1, 3))
    def compact_then_expire(self, keep_last, keep_tail):
        """Round 12 (r11 verdict item 6): expiry AFTER compaction folded
        the prefix — the ts lookups expiry needs live on the links that
        superseded each retained generation, and compact_manifest's fold
        rule stops at any link whose superseded names are retained or on
        disk, so those links must still be consultable. A mis-fold would
        surface here as a retained entry aging to 'unknown' (kept
        forever) or as a durability-invariant violation right after."""
        compact_manifest(self.dir, keep_tail=keep_tail)
        expire_snapshots(self.dir, older_than_sec=0, keep_last=keep_last)
        compact_manifest(self.dir, keep_tail=keep_tail)
        self._just_compacted = True

    @rule()
    def resume_same_args_is_idempotent(self):
        self._just_compacted = False
        """Re-publishing the current head with the same args (the
        crash-retry shape) must not duplicate history links."""
        head = self._head()
        if head is None:
            return
        hist_before, _ = _read_manifest(self.dir)
        publish_generation(
            self.dir, os.path.join(self.dir, "gone.staged"), head,
            superseded=[],
        )
        hist_after, _ = _read_manifest(self.dir)
        assert len(hist_after) == len(hist_before), "duplicate link"

    # --- invariants ----------------------------------------------------------

    @invariant()
    def head_is_durable(self):
        head = self._head()
        if head is None:
            return
        p = os.path.join(self.dir, head)
        assert os.path.isdir(p), f"head {head} lost"
        marker = os.path.join(p, "DATA")
        if os.path.exists(marker):  # content never rewritten by metadata ops
            assert open(marker).read() == head.split(".")[0]

    @invariant()
    def all_live_heads_durable(self):
        """Every uncommitted-over generation — including the non-mirror
        members of multi-table links and compaction-checkpoint heads —
        keeps its directory and content."""
        p = os.path.join(self.dir, "VACUUM.json")
        if not os.path.exists(p):
            return
        m = json.load(open(p))
        hist = m.get("history", [])
        ever_sup = {n for h in hist for n in h["superseded"]}
        bys = list((m.get("checkpoint") or {}).get("heads", [])) + [
            b for h in hist for b in (h.get("bys") or [h["by"]])
        ]
        for b in bys:
            if b in ever_sup:
                continue
            d = os.path.join(self.dir, b)
            assert os.path.isdir(d), f"live head {b} lost"
            marker = os.path.join(d, "DATA")
            if os.path.exists(marker):
                assert open(marker).read() == b.split(".")[0]

    @invariant()
    def ckpt_heads_not_tail_superseded(self):
        """Round 12 (the k26 nit): compact_manifest purges from
        checkpoint.heads any name a REMAINING tail link superseded —
        a dead head must never be listed past the compaction that could
        see its death certificate. (A later tail link may legitimately
        re-commit the same name; its liveness is then carried by that
        link's own by, so the checkpoint record still must not list it.)
        Enforced only immediately after a compaction ran (commits between
        compactions may legitimately supersede a checkpoint head)."""
        if not getattr(self, "_just_compacted", False):
            return
        p = os.path.join(self.dir, "VACUUM.json")
        if not os.path.exists(p):
            return
        m = json.load(open(p))
        tail_sup = {
            n for h in m.get("history", []) for n in h["superseded"]
        }
        stale = [
            n
            for n in (m.get("checkpoint") or {}).get("heads", [])
            if n in tail_sup
        ]
        assert not stale, f"checkpoint.heads lists tail-superseded {stale}"

    @invariant()
    def branch_refs_are_durable(self):
        for branch, gen in _read_branches(self.dir).items():
            assert os.path.isdir(os.path.join(self.dir, gen)), (
                f"branch {branch} -> {gen} dangling"
            )

    @invariant()
    def retained_window_is_durable(self):
        _, retained = _read_manifest(self.dir)
        for gen in retained:
            assert os.path.isdir(os.path.join(self.dir, gen)), (
                f"retained {gen} lost"
            )


GenerationProtocol.TestCase.settings = settings(
    max_examples=60, stateful_step_count=30, deadline=None
)
TestGenerationProtocol = GenerationProtocol.TestCase


def _occ_worker(base: str, who: str, n_commits: int, barrier, q) -> None:
    """Spawn-target: commit n generations via the real OCC retry loop —
    read head, stage, publish with CAS, on conflict re-read and retry."""
    import os
    import shutil

    from dask_pipes_spark.session import (
        CommitConflictError,
        publish_generation,
    )

    barrier.wait()
    committed = []
    for i in range(n_commits):
        attempt = 0
        while True:
            attempt += 1
            hist, _ = _read_manifest(base)
            head = hist[-1]["by"] if hist else None
            name = f"g-{who}-{i:02d}-a{attempt}"
            staged = os.path.join(base, f"{name}.staged")
            os.makedirs(staged, exist_ok=True)
            open(os.path.join(staged, "DATA"), "w").write(name)
            try:
                publish_generation(
                    base, staged, name,
                    superseded=[], expected_head=head,
                )
                committed.append(name)
                break
            except CommitConflictError:
                shutil.rmtree(staged, ignore_errors=True)  # re-base: restage
    q.put((who, committed))


def _proto_worker(base: str, who: str, n_ops: int, barrier, q) -> None:
    """Spawn-target (round 11 — the r10 verdict's item 4, composing the
    single-process hypothesis machine with the OCC soak): one worker
    executing a seeded-random stream of protocol ops against a SHARED
    index dir — CAS publishes with the real retry loop, branch
    create/merge/retire, GC (multi-maintainer age guard), age expiry,
    and manifest compaction — expecting only the protocol's DECLARED
    refusals (CommitConflictError → re-base; ValueError from a lost
    pin race → re-list)."""
    import os
    import random
    import shutil

    from dask_pipes_spark.session import (
        CommitConflictError,
        compact_manifest,
        delete_branch,
        expire_snapshots,
        gc_index_dir,
        merge_branch,
        publish_generation,
        set_branch,
    )

    rng = random.Random(f"proto-{who}")
    barrier.wait()
    committed: list[str] = []

    def _publish(branch=None, retain=0):
        for attempt in range(1, 50):
            hist, _ = _read_manifest(base)
            head = hist[-1]["by"] if hist else None
            name = f"g-{who}-{len(committed):03d}-a{attempt}"
            staged = os.path.join(base, f"{name}.staged")
            os.makedirs(staged, exist_ok=True)
            open(os.path.join(staged, "DATA"), "w").write(name)
            try:
                publish_generation(
                    base, staged, name,
                    superseded=[head] if (head and rng.random() < 0.5) else [],
                    retain=retain, expected_head=head, branch=branch,
                )
                committed.append(name)
                return
            except CommitConflictError:
                shutil.rmtree(staged, ignore_errors=True)
        raise AssertionError("OCC retry loop starved after 49 attempts")

    for _ in range(n_ops):
        op = rng.random()
        if op < 0.35:
            _publish(
                branch=f"audit-{who}" if rng.random() < 0.3 else None,
                retain=rng.randint(0, 2),
            )
        elif op < 0.45:
            # pin a branch to some currently-existing generation; losing
            # the race to retention is a DECLARED refusal
            gens = [
                n for n in os.listdir(base)
                if os.path.isdir(os.path.join(base, n))
                and not n.endswith(".staged")
                and "." not in n
            ]
            if gens:
                try:
                    set_branch(base, f"pin-{who}", rng.choice(gens))
                except ValueError:
                    pass
        elif op < 0.55:
            branches = _read_branches(base)
            src = f"audit-{who}"
            if src in branches:
                try:
                    merge_branch(
                        base, src, "main",
                        expected_head=branches.get("main"),
                    )
                except (CommitConflictError, ValueError):
                    pass  # another worker moved main — re-base next loop
        elif op < 0.65:
            delete_branch(
                base, rng.choice([f"pin-{who}", f"audit-{who}"]),
                retain=rng.randint(0, 1),
            )
        elif op < 0.8:
            # multi-maintainer GC: the age guard is what makes a sweep
            # safe while other workers hold young staged dirs
            gc_index_dir(base, older_than_sec=3600)
        elif op < 0.9:
            expire_snapshots(base, older_than_sec=0, keep_last=1)
        else:
            compact_manifest(base, keep_tail=rng.randint(2, 5))
    q.put((who, committed))


def test_multiprocess_protocol_soak(tmp_path):
    """Four processes x 50 random protocol ops against ONE index dir
    (round 11): after the join, every durability invariant the
    single-process fuzzer checks must hold — parseable manifest, durable
    manifest head with intact content, every live head (including
    multi-table bys and compaction-checkpoint heads) on disk, every
    retained entry on disk, every branch ref resolvable, and a final GC
    that is re-entrant. Zero invariant violations is the bar."""
    import json
    import multiprocessing as mp
    import os

    from dask_pipes_spark.session import (
        _append_vacuum_link,
        gc_index_dir,
        set_branch,
    )

    base = str(tmp_path / "idx")
    os.makedirs(os.path.join(base, "g000"))
    open(os.path.join(base, "g000", "DATA"), "w").write("g000")
    _append_vacuum_link(base, [], "g000", 0)
    set_branch(base, "main", "g000")

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(4)
    q = ctx.Queue()
    ps = [
        ctx.Process(target=_proto_worker, args=(base, w, 50, barrier, q))
        for w in "ABCD"
    ]
    for p in ps:
        p.start()
    results = dict(q.get(timeout=300) for _ in ps)
    for p in ps:
        p.join(timeout=300)
        assert p.exitcode == 0, f"worker crashed: {p.exitcode}"

    man = json.load(open(os.path.join(base, "VACUUM.json")))
    hist = man.get("history", [])
    assert hist, "manifest must survive the soak"
    chain = [h["by"] for h in hist]
    ever_sup = {n for h in hist for n in h["superseded"]}
    bys = list((man.get("checkpoint") or {}).get("heads", [])) + [
        b for h in hist for b in (h.get("bys") or [h["by"]])
    ]
    for b in bys:
        if b in ever_sup:
            continue
        p = os.path.join(base, b)
        assert os.path.isdir(p), f"live head {b} lost"
        marker = os.path.join(p, "DATA")
        if os.path.exists(marker):
            assert open(marker).read() == b.split(".")[0]
    for gen in man.get("retained", []):
        assert os.path.isdir(os.path.join(base, gen)), f"retained {gen} lost"
    for branch, gen in _read_branches(base).items():
        assert os.path.isdir(os.path.join(base, gen)), (
            f"branch {branch} -> {gen} dangling"
        )
    # every commit the workers report landed exactly once in the history
    reported = [n for lst in results.values() for n in lst]
    assert reported, "workers must have committed something"
    assert len(reported) == len(set(reported)), "worker name collision"
    # no PHANTOM commits: every worker-named entry in the manifest (tail
    # links or compaction-checkpoint heads) was a reported commit. The
    # converse — every reported commit still visible — does NOT hold here
    # by design: compaction folds away links whose superseded generations
    # were already vacuumed, so old superseded commits leave the manifest
    # entirely (exact lost-update accounting is
    # test_occ_retry_loop_no_lost_updates_across_processes's job, which
    # runs without compaction). What must survive is checked above: every
    # LIVE head durable with intact content, retained window durable,
    # refs resolvable.
    ck_heads = set((man.get("checkpoint") or {}).get("heads", []))
    visible = {b for b in chain if b.startswith("g-")} | {
        b for b in ck_heads if b.startswith("g-")
    }
    assert visible <= set(reported), (
        f"phantom commits in manifest: {visible - set(reported)}"
    )
    # the manifest head itself is a real commit (or the seed)
    assert chain[-1] == "g000" or chain[-1] in set(reported)
    # final sweep converges: a second GC removes nothing
    gc_index_dir(base, older_than_sec=0)
    rep2 = gc_index_dir(base, older_than_sec=0)
    assert rep2["removed"] == [], rep2


def _kill_target(base: str, who: str, barrier) -> None:
    """Spawn-target for the SIGKILL soak: publish generations through the
    OCC retry loop FOREVER — the parent kills this process at a random
    point, so death can land inside staging, inside the commit lock's
    critical section (rename / manifest temp+rename / vacuum rmtree), or
    between any two steps. fcntl locks die with the process, temp+rename
    keeps the manifest atomic, and rename-then-link ordering keeps every
    observable state recoverable — that is the claim this soak attacks."""
    import os
    import shutil

    from dask_pipes_spark.session import (
        CommitConflictError,
        publish_generation,
    )

    barrier.wait()
    i = 0
    while True:
        attempt = 0
        while True:
            attempt += 1
            hist, _ = _read_manifest(base)
            head = hist[-1]["by"] if hist else None
            name = f"g-{who}-{i:04d}-a{attempt}"
            staged = os.path.join(base, f"{name}.staged")
            os.makedirs(staged, exist_ok=True)
            with open(os.path.join(staged, "DATA"), "w") as fh:
                fh.write(name)
            try:
                publish_generation(
                    base, staged, name, superseded=[head] if head else [],
                    retain=1, expected_head=head,
                )
                break
            except CommitConflictError:
                shutil.rmtree(staged, ignore_errors=True)
        i += 1


def test_sigkill_mid_protocol_recovers(tmp_path):
    """Crash-recovery under REAL process kills (round 11): three rounds
    of (start two publishers, SIGKILL both at a random moment, verify).
    After every massacre: the manifest parses, the head's directory and
    content are intact, every live head and retained entry is durable,
    orphan GC sweeps the kill debris and is re-entrant, and a fresh
    publisher commits successfully on top of the carnage — the
    structural claims (atomic temp+rename manifest, rename-then-link
    ordering, OS-released fcntl locks) demonstrated against actual
    SIGKILL rather than simulated torn layouts."""
    import json
    import multiprocessing as mp
    import os
    import random
    import time

    from dask_pipes_spark.session import (
        _append_vacuum_link,
        gc_index_dir,
        publish_generation,
    )

    base = str(tmp_path / "idx")
    os.makedirs(os.path.join(base, "g000"))
    with open(os.path.join(base, "g000", "DATA"), "w") as fh:
        fh.write("g000")
    _append_vacuum_link(base, [], "g000", 0)

    rng = random.Random("sigkill-soak")
    ctx = mp.get_context("spawn")
    for rnd in range(3):
        barrier = ctx.Barrier(3)
        ps = [
            ctx.Process(target=_kill_target, args=(base, f"r{rnd}{w}", barrier))
            for w in "AB"
        ]
        for p in ps:
            p.start()
        barrier.wait()  # workers are live and publishing
        time.sleep(rng.uniform(0.05, 0.4))
        for p in ps:
            p.kill()  # SIGKILL — no cleanup, no lock release by python
        for p in ps:
            p.join(timeout=60)

        # --- recovery invariants ---
        man = json.load(open(os.path.join(base, "VACUUM.json")))
        hist = man["history"]
        head = hist[-1]["by"]
        marker = os.path.join(base, head, "DATA")
        assert os.path.exists(marker), f"head {head} lost after kill"
        with open(marker) as fh:
            assert fh.read() == head, "head content torn"
        ever_sup = {n for h in hist for n in h["superseded"]}
        for h in hist:
            for b in h.get("bys") or [h["by"]]:
                if b not in ever_sup:
                    assert os.path.isdir(os.path.join(base, b)), (
                        f"live head {b} lost after kill"
                    )
        for gen in man.get("retained", []):
            assert os.path.isdir(os.path.join(base, gen)), (
                f"retained {gen} lost after kill"
            )
        # the janitor clears the kill debris; single-maintainer age guard
        gc_index_dir(base, older_than_sec=0)
        rep2 = gc_index_dir(base, older_than_sec=0)
        assert rep2["removed"] == [], "GC not re-entrant after kill"
        # the protocol is live again: a clean publish lands on top
        staged = os.path.join(base, f"post-kill-{rnd}.staged")
        os.makedirs(staged)
        with open(os.path.join(staged, "DATA"), "w") as fh:
            fh.write(f"post-kill-{rnd}")
        hist, _ = _read_manifest(base)
        publish_generation(
            base, staged, f"post-kill-{rnd}",
            superseded=[hist[-1]["by"]], expected_head=hist[-1]["by"],
        )
        man = json.load(open(os.path.join(base, "VACUUM.json")))
        assert man["by"] == f"post-kill-{rnd}"


def test_occ_retry_loop_no_lost_updates_across_processes(tmp_path):
    """Four processes each drive ten commits through the optimistic
    retry loop against ONE index dir: every commit lands exactly once
    (40 + the seed link in the history, no duplicates), every committed
    generation's bytes are present, and the history's heads chain is
    consistent (each link's expected head was the previous link) — the
    lost-update freedom the CAS exists to provide, under real
    cross-process contention."""
    import json
    import multiprocessing as mp
    import os

    from dask_pipes_spark.session import _append_vacuum_link

    base = str(tmp_path / "idx")
    os.makedirs(os.path.join(base, "g000"))
    _append_vacuum_link(base, [], "g000", 0)

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(4)
    q = ctx.Queue()
    ps = [
        ctx.Process(target=_occ_worker, args=(base, w, 10, barrier, q))
        for w in "ABCD"
    ]
    for p in ps:
        p.start()
    results = dict(q.get(timeout=180) for _ in ps)
    for p in ps:
        p.join(timeout=180)
    committed = [g for lst in results.values() for g in lst]
    assert len(committed) == 40
    man = json.load(open(os.path.join(base, "VACUUM.json")))
    chain = [h["by"] for h in man["history"]]
    assert chain[0] == "g000"
    assert len(chain) == 41, f"lost or duplicated commit: {len(chain)}"
    assert len(set(chain)) == 41, "duplicate history link"
    assert set(chain[1:]) == set(committed)
    for g in committed:
        marker = os.path.join(base, g, "DATA")
        assert os.path.exists(marker), f"committed bytes missing: {g}"
        assert open(marker).read() == g
