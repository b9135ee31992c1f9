"""bench.py orchestration tests (CPU-only, no TPU, no jax in the parent).

The round's driver deliverable is bench.py printing exactly ONE parseable
JSON line and exiting 0 no matter how hostile the runtime is (hung
compiles, crashed children, budget expiry, external SIGTERM).  Round 3's
driver run produced rc=124 and NOTHING; these tests pin the deadline-proof
contract so it cannot regress.

Everything here monkeypatches the subprocess boundary (``bench._run_child``
/ ``bench._wait_for_runtime``), so no child processes or TPU/JAX work is
involved: the tests cover the jax-free parent orchestration only.
"""

import importlib.util
import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    """A fresh bench module instance per test (module state: BUDGET_S,
    _current_child)."""
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # Tests never want the real 4-minute runtime-probe loop.
    monkeypatch.setattr(mod, "_wait_for_runtime", lambda max_wait_s: None)
    # ... nor to touch the repo's real last-good diagnostics file.
    monkeypatch.setattr(mod, "LAST_GOOD_PATH",
                        str(tmp_path / "last_good.json"))

    # The PAIR child (one process, several configs) is emulated by routing
    # each spec through the test's (monkeypatched) _run_child --one handler,
    # mirroring _pair's semantics: remaining specs are skipped once the
    # first config fails.  Tests keep stubbing the single subprocess
    # boundary they always have.
    real_run_child_all = mod._run_child_all

    def pair_via_one(args, timeout_s, extend_to_s=None):
        if "--pair" not in args:
            return real_run_child_all(args, timeout_s)
        i = args.index("--pair")
        specs = args[i + 1].split(",")
        rest = args[i + 2:]
        results = []
        rc = 0
        for j, spec in enumerate(specs):
            if j > 0 and results and not results[0].get("ok"):
                results.append({"ok": False, "spec": spec,
                                "error": "skipped: first pair config failed"})
                continue
            # pair children effectively run under the extended deadline
            # (their --budget_s is derived from it) once config 1 is ok
            rc1, r, err = mod._run_child(["--one", spec, *rest],
                                         extend_to_s or timeout_s)
            if rc1 is None:
                return None, results, err
            rc = rc1
            if r is not None:
                r = dict(r)
                r["spec"] = spec
                results.append(r)
        return rc, results, ""

    monkeypatch.setattr(mod, "_run_child_all", pair_via_one)
    return mod


def _fake_result(value, batch=16, dtype="bfloat16"):
    return {
        "ok": True, "batch": batch, "dtype": dtype, "remat": False,
        "seqs_per_sec_per_chip": value, "step_ms": batch / value * 1e3,
        "n_chips": 1, "backend": "tpu", "compile_s": {"main": 1.0},
        "pl_mode": "fused", "main_mode": "fused",
    }


def _last_json_line(capsys):
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {out!r}"
    return json.loads(lines[0])


def test_parse_candidate_roundtrip(bench):
    assert bench._parse_candidate("bfloat16:16:False") == ("bfloat16", 16, False)
    assert bench._parse_candidate("float32:8:True") == ("float32", 8, True)
    assert bench._parse_candidate("bfloat16:24:128") == ("bfloat16", 24, 128)


def test_remat_kw_mapping(bench):
    assert bench._remat_kw(False) == dict(remat=False)
    assert bench._remat_kw(True) == dict(remat=True, remat_min_px=0)
    assert bench._remat_kw(128) == dict(remat=True, remat_min_px=128)


def test_happy_path_known_good_then_explore(bench, monkeypatch, capsys):
    """Healthy runtime: KNOWN_GOOD measured first; best-of wins; one line."""
    calls = []

    def fake_child(args, timeout_s):
        calls.append(args)
        if "--extras" in args:
            return 0, {"worker_matmul_tflops": 170.0}, ""
        spec = args[args.index("--one") + 1]
        dtype, batch, remat = bench._parse_candidate(spec)
        # Make one EXPLORE config beat KNOWN_GOOD.
        value = 17.5 if batch == 24 else 16.1
        return 0, _fake_result(value, batch=batch, dtype=dtype), ""

    monkeypatch.setattr(bench, "_run_child", fake_child)
    bench.run_bench(steps=4, warmup=1)
    out = _last_json_line(capsys)
    assert out["metric"] == "train_seqs_per_sec_per_chip"
    assert out["value"] == 17.5
    assert out["batch"] == 24
    # KNOWN_GOOD ran first.
    first_spec = calls[0][calls[0].index("--one") + 1]
    assert bench._parse_candidate(first_spec) == bench.KNOWN_GOOD
    # Every attempt is recorded, ok=True.
    assert all(a["ok"] for a in out["attempts"])
    assert out["vs_baseline"] > 0


def test_vs_baseline_uses_committed_baseline(bench, monkeypatch, capsys):
    monkeypatch.setattr(
        bench, "_run_child",
        lambda args, t: (0, _fake_result(16.0), "") if "--one" in args
        else (1, None, ""))
    bench.run_bench(steps=4, warmup=1)
    out = _last_json_line(capsys)
    base = json.load(open(os.path.join(_REPO, "BENCH_BASELINE.json")))["value"]
    assert out["vs_baseline"] == pytest.approx(16.0 / base, abs=1e-3)


def test_degraded_runtime_walks_fallback_ladder(bench, monkeypatch, capsys):
    """KNOWN_GOOD fails -> first fallback success wins, EXPLORE skipped."""
    def fake_child(args, timeout_s):
        if "--extras" in args:
            return 0, {}, ""
        spec = args[args.index("--one") + 1]
        dtype, batch, remat = bench._parse_candidate(spec)
        if (dtype, batch, remat) == bench.KNOWN_GOOD:
            return 1, {"ok": False, "error": "RESOURCE_EXHAUSTED"}, ""
        if (dtype, batch, remat) == bench.FALLBACKS[0]:
            return 0, _fake_result(9.0, batch=batch), ""
        raise AssertionError(f"unexpected candidate {spec}")

    monkeypatch.setattr(bench, "_run_child", fake_child)
    bench.run_bench(steps=4, warmup=1)
    out = _last_json_line(capsys)
    assert out["value"] == 9.0
    failed = [a for a in out["attempts"] if not a["ok"]]
    assert failed and "RESOURCE_EXHAUSTED" in failed[0]["error"]


def test_everything_fails_still_prints_one_parseable_line(
        bench, monkeypatch, capsys):
    """Worst case (round 3's killer): every child hangs/dies.  The bench
    must still print exactly one JSON line with value 0.0 and the attempt
    record, and must not raise."""
    monkeypatch.setattr(bench, "_run_child",
                        lambda args, t: (None, None, "wedged"))
    bench.run_bench(steps=4, warmup=1)
    out = _last_json_line(capsys)
    assert out["value"] == 0.0
    assert out["vs_baseline"] == 0.0
    assert "error" in out
    assert out["attempts"], "attempt record must be present"
    assert all(not a["ok"] for a in out["attempts"])


def test_emergency_tier_fires_when_all_primaries_fail(
        bench, monkeypatch, capsys):
    def fake_child(args, timeout_s):
        if "--extras" in args:
            return 0, {}, ""
        spec = args[args.index("--one") + 1]
        cand = bench._parse_candidate(spec)
        if cand == bench.EMERGENCY:
            return 0, _fake_result(2.5, batch=cand[1]), ""
        return 1, {"ok": False, "error": "compile helper exit 1"}, ""

    monkeypatch.setattr(bench, "_run_child", fake_child)
    bench.run_bench(steps=4, warmup=1)
    out = _last_json_line(capsys)
    assert out["value"] == 2.5
    assert out["batch"] == bench.EMERGENCY[1]


def test_budget_expiry_skips_explore_and_annotates(
        bench, monkeypatch, capsys):
    """Once the global budget is gone, EXPLORE candidates are not attempted
    and the skip is visible in the attempts record."""
    def fake_child(args, timeout_s):
        if "--extras" in args:
            return 0, {}, ""
        # Simulate the KNOWN_GOOD child consuming the whole budget.
        b = bench._ACTIVE_BENCH
        b.deadline = 0.0  # monotonic() is always past this
        return 0, _fake_result(16.1), ""

    monkeypatch.setattr(bench, "_run_child", fake_child)

    orig_init = bench._Bench.__init__

    def patched_init(self, steps, warmup):
        orig_init(self, steps, warmup)
        bench._ACTIVE_BENCH = self

    monkeypatch.setattr(bench._Bench, "__init__", patched_init)
    bench.run_bench(steps=4, warmup=1)
    out = _last_json_line(capsys)
    assert out["value"] == 16.1
    skipped = [a for a in out["attempts"]
               if a.get("config") == "remaining EXPLORE"]
    assert skipped and skipped[0]["error"] == "budget exhausted"


def test_emit_is_idempotent(bench, capsys):
    b = bench._Bench(steps=4, warmup=1)
    b.emit()
    b.emit()
    _last_json_line(capsys)  # asserts exactly one line


def test_orchestrator_exception_still_emits(bench, monkeypatch, capsys):
    def boom(args, timeout_s):
        raise RuntimeError("orchestration bug")

    monkeypatch.setattr(bench, "_run_child", boom)
    bench.run_bench(steps=4, warmup=1)
    out = _last_json_line(capsys)
    assert out["value"] == 0.0
    assert any(a.get("config") == "orchestrator" for a in out["attempts"])


def test_sigterm_prints_best_so_far_and_exits_zero():
    """The real SIGTERM handler, in a real process (it calls os._exit so it
    cannot run in-process): children are stubbed to hang forever — no jax,
    no TPU — and an external SIGTERM must still yield one parseable JSON
    line on stdout and rc=0.  This is the round-3 failure mode (driver
    rc=124, no output) pinned for good."""
    import signal
    import subprocess
    import time

    stub = (
        "import importlib.util, sys, time\n"
        f"spec = importlib.util.spec_from_file_location('b', {os.path.join(_REPO, 'bench.py')!r})\n"
        "b = importlib.util.module_from_spec(spec); spec.loader.exec_module(b)\n"
        "b._wait_for_runtime = lambda s: None\n"
        "def hang(args, timeout_s, extend_to_s=None):\n"
        "    print('CHILD_STARTED', file=sys.stderr, flush=True)\n"
        "    time.sleep(3600)\n"
        "b._run_child = hang\n"
        "b._run_child_all = hang\n"
        "b.run_bench(steps=4, warmup=1)\n"
    )
    env = dict(os.environ, BENCH_BUDGET_S="3600", BENCH_RESERVE_S="1",
               PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(
        [sys.executable, "-c", stub],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
    # Python startup is ~6 s in this environment: wait for the stub's
    # readiness marker (handler installed, child hanging) before signaling.
    marker = proc.stderr.readline()
    assert "CHILD_STARTED" in marker, marker
    time.sleep(0.2)
    proc.send_signal(signal.SIGTERM)
    try:
        out, _ = proc.communicate(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()
        pytest.fail("bench.py did not exit after SIGTERM")
    assert proc.returncode == 0
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["metric"] == "train_seqs_per_sec_per_chip"


def test_fallbacks_lead_with_prewarmed_b4_and_skip_pl(bench, monkeypatch,
                                                      capsys):
    """Degraded path: the first fallback is the prewarmed b4 config (a cold
    b8 compile cannot fit the remaining budget) and fallback children run
    with --skip_pl so their fixed cost stays minimal."""
    assert bench.FALLBACKS[0] == ("bfloat16", 4, True)
    seen = []

    def fake_child(args, timeout_s):
        if "--extras" in args:
            return 0, {}, ""
        seen.append(tuple(args))
        spec = args[args.index("--one") + 1]
        cand = bench._parse_candidate(spec)
        if cand == bench.KNOWN_GOOD:
            return 1, {"ok": False, "error": "degraded"}, ""
        return 0, _fake_result(6.7, batch=cand[1]), ""

    monkeypatch.setattr(bench, "_run_child", fake_child)
    bench.run_bench(steps=4, warmup=1)
    out = _last_json_line(capsys)
    assert out["value"] == 6.7 and out["batch"] == 4
    fallback_args = seen[1]
    assert "--skip_pl" in fallback_args
    assert "--skip_pl" not in seen[0]  # KNOWN_GOOD runs the full step


def test_total_failure_reports_last_good_diagnostics(bench, monkeypatch,
                                                     capsys):
    """A run that measured something persists it; a later total-failure run
    surfaces it as diagnostics while keeping value 0.0."""
    def first_run_child(args, timeout_s):
        if "--extras" in args:
            return 0, {}, ""
        spec = args[args.index("--one") + 1]
        cand = bench._parse_candidate(spec)
        if cand == bench.KNOWN_GOOD:
            return 0, _fake_result(16.1), ""
        return 1, {"ok": False, "error": "x"}, ""

    monkeypatch.setattr(bench, "_run_child", first_run_child)
    bench.run_bench(steps=4, warmup=1)
    _last_json_line(capsys)  # drain

    bench2 = bench  # same module instance: fresh _Bench inside run_bench
    monkeypatch.setattr(bench2, "_run_child",
                        lambda args, t: (None, None, "wedged"))
    bench2.run_bench(steps=4, warmup=1)
    out = _last_json_line(capsys)
    assert out["value"] == 0.0
    lg = out["last_good_on_this_machine"]
    assert lg["result"]["seqs_per_sec_per_chip"] == 16.1
    assert "recorded_at" in lg


def test_tier_record_mapping(bench):
    """Prewarm per-program verdicts map to the FIRST working ladder tier."""
    assert bench._tier_record({"main_fused": True, "pl_fused": True}) == {
        "main": "fused", "pl": "fused"}
    assert bench._tier_record(
        {"main_split": True, "pl_apply": True, "pl_chunk3": True}
    ) == {"main": "split", "pl": "chunked3"}
    assert bench._tier_record(
        {"main_fused": True, "pl_apply": True, "pl_grads": True,
         "pl_chunk2": True}) == {"main": "fused", "pl": "split"}
    # The apply program is required by every grads-side tier.
    assert bench._tier_record({"main_fused": True, "pl_grads": True}) == {
        "main": "fused", "pl": "excluded"}
    assert bench._tier_record({})["pl"] == "excluded"


def test_record_and_load_tier_hints(bench, monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "TIERS_PATH", str(tmp_path / "tiers.json"))
    monkeypatch.delenv("BENCH_IGNORE_TIER_HINTS", raising=False)
    bench._record_tiers(("bfloat16", 16, False),
                        {"main_fused": True, "pl_apply": True,
                         "pl_chunk3": True})
    bench._record_tiers(("bfloat16", 24, True),
                        {"main_split": True})
    assert bench._load_tier_hints("bfloat16:16:False") == {
        "main": "fused", "pl": "chunked3"}
    assert bench._load_tier_hints("bfloat16:24:True") == {
        "main": "split", "pl": "excluded"}
    assert bench._load_tier_hints("float32:16:True") is None
    monkeypatch.setenv("BENCH_IGNORE_TIER_HINTS", "1")
    assert bench._load_tier_hints("bfloat16:16:False") is None


def test_attempt_passes_child_budget(bench, monkeypatch, capsys):
    """Every measuring child gets --budget_s ~= its kill timeout minus a
    margin, so it self-truncates (skip PL + proxy) instead of dying with
    nothing — the round-4 attestation failure mode."""
    seen = []

    def fake_child(args, timeout_s):
        if "--extras" in args:
            return 0, {}, ""
        seen.append((list(args), timeout_s))
        return 0, _fake_result(16.1), ""

    monkeypatch.setattr(bench, "_run_child", fake_child)
    bench.run_bench(steps=4, warmup=1)
    _last_json_line(capsys)
    assert seen
    for args, timeout_s in seen:
        budget = float(args[args.index("--budget_s") + 1])
        assert budget == max(60, int(timeout_s - 45))
        assert budget < timeout_s


def test_wait_for_runtime_caps_probe_attempts(monkeypatch):
    """The probe loop gives up after 2 failed probes - budget belongs to
    the measuring children, not to diagnostics."""
    # A fresh module WITHOUT the fixture's _wait_for_runtime stub.
    spec = importlib.util.spec_from_file_location(
        "bench_probe_test", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    calls = []

    class FakeProc:
        returncode = 1

    def fake_run(cmd, capture_output, timeout):
        calls.append(timeout)
        return FakeProc()

    monkeypatch.setattr(mod.subprocess, "run", fake_run)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    mod._wait_for_runtime(600.0)
    assert len(calls) == 2


def test_stale_excluded_pl_hint_is_dropped(bench, monkeypatch, tmp_path):
    """A pl='excluded' verdict is only trusted while fresh: past
    TIER_HINT_MAX_AGE_S the exclusion is dropped so one bad prewarm cannot
    pin every later bench run to the proxy-charged number (ADVICE r4)."""
    import time as _time

    monkeypatch.setattr(bench, "TIERS_PATH", str(tmp_path / "tiers.json"))
    monkeypatch.delenv("BENCH_IGNORE_TIER_HINTS", raising=False)
    bench._record_tiers(("bfloat16", 24, True), {"main_split": True})
    # fresh: exclusion honored
    assert bench._load_tier_hints("bfloat16:24:True")["pl"] == "excluded"
    # age the record past the cutoff
    tiers = json.load(open(bench.TIERS_PATH))
    old = _time.strftime("%Y-%m-%d %H:%M:%S",
                         _time.localtime(_time.time()
                                         - bench.TIER_HINT_MAX_AGE_S - 60))
    tiers["recorded_at"] = old
    json.dump(tiers, open(bench.TIERS_PATH, "w"))
    hint = bench._load_tier_hints("bfloat16:24:True")
    assert "pl" not in hint and hint["main"] == "split"
    # an unparseable timestamp counts as stale, not as fresh
    tiers["recorded_at"] = "not-a-date"
    json.dump(tiers, open(bench.TIERS_PATH, "w"))
    assert "pl" not in bench._load_tier_hints("bfloat16:24:True")


def test_emergency_child_budget_never_exceeds_timeout(bench, monkeypatch,
                                                      capsys):
    """With a tiny remaining budget the child's --budget_s must stay inside
    the kill timeout so its self-truncation margins can fire (ADVICE r4)."""
    seen = []

    def fake_child(args, timeout_s):
        if "--one" in args:
            seen.append((list(args), timeout_s))
            return 1, None, "boom"
        return 0, {}, ""

    monkeypatch.setattr(bench, "_run_child", fake_child)
    b = bench._Bench(steps=4, warmup=1)
    b.attempt(bench.EMERGENCY, 30.0)
    b.attempt(bench.EMERGENCY, 100.0)
    b.attempt(bench.EMERGENCY, 600.0)
    assert len(seen) == 3
    for args, timeout_s in seen:
        budget = float(args[args.index("--budget_s") + 1])
        assert budget <= timeout_s - 15
    # the large-timeout case keeps the old floor semantics
    args, timeout_s = seen[2]
    assert float(args[args.index("--budget_s") + 1]) == max(
        60, int(timeout_s - 45))


def test_run_child_all_streams_and_extends_deadline():
    """The child supervisor streams stdout and extends the kill deadline
    once a JSON line with ok:true appears (round-5: the pair child's b24
    half was killed while the emergency reserve sat idle).  Without the
    extension the child is killed mid-sleep and its first line is kept."""
    spec = importlib.util.spec_from_file_location(
        "bench_stream_test", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    child = (
        "import json, sys, time\n"
        "print(json.dumps({'ok': True, 'v': 1})); sys.stdout.flush()\n"
        "time.sleep({sleep})\n"
        "print(json.dumps({'ok': True, 'v': 2})); sys.stdout.flush()\n"
    )
    # no extension: killed during the sleep; the first line survives
    mod._CHILD_CMD = [sys.executable, "-u", "-c",
                      child.replace("{sleep}", "30")]
    rc, parsed, _ = mod._run_child_all([], timeout_s=10.0)
    assert rc is None
    assert [p["v"] for p in parsed] == [1]

    # with extension: the ok line pushes the deadline out and the child
    # finishes normally even though its sleep overruns the initial timeout
    mod._CHILD_CMD = [sys.executable, "-u", "-c",
                      child.replace("{sleep}", "8")]
    rc, parsed, _ = mod._run_child_all([], timeout_s=10.0, extend_to_s=60.0)
    assert rc == 0
    assert [p["v"] for p in parsed] == [1, 2]


def test_attempt_pair_budget_follows_extension(bench, monkeypatch):
    """attempt_pair forwards extend_to_s to the supervisor and computes the
    child's self-truncation budget from the EXTENDED deadline, so the
    child does not skip its second config against the unextended one."""
    seen = {}

    def fake(args, timeout_s, extend_to_s=None):
        seen.update(args=args, timeout=timeout_s, extend=extend_to_s)
        return 0, [], ""

    monkeypatch.setattr(bench, "_run_child_all", fake)
    b = bench._Bench(4, 1)
    b.attempt_pair((bench.KNOWN_GOOD, bench.PAIR_EXPLORE), 600.0,
                   extend_to_s=900.0)
    assert seen["timeout"] == 600.0 and seen["extend"] == 900.0
    budget = float(seen["args"][seen["args"].index("--budget_s") + 1])
    assert budget == 855.0  # 900 - 45, not 600 - 45


def test_pair_child_delivers_two_measured_attempts(bench, monkeypatch,
                                                   capsys):
    """The round-5 delivery contract (VERDICT r4 item 3): one pair child
    measures KNOWN_GOOD + the reference-regime b24 config, so the attempts
    record carries >= 2 ok entries without paying two device-init
    handshakes."""
    pair_calls = []

    def fake_child_all(args, timeout_s, extend_to_s=None):
        if "--pair" not in args:
            return 1, [], ""
        pair_calls.append(list(args))
        specs = args[args.index("--pair") + 1].split(",")
        results = []
        for spec in specs:
            d, b, r = bench._parse_candidate(spec)
            res = _fake_result(16.1 if b == 16 else 14.2, batch=b, dtype=d)
            res["spec"] = spec
            results.append(res)
        return 0, results, ""

    def fake_child(args, timeout_s):
        if "--extras" in args:
            return 0, {}, ""
        spec = args[args.index("--one") + 1]
        d, b, r = bench._parse_candidate(spec)
        return 0, _fake_result(14.0, batch=b, dtype=d), ""

    monkeypatch.setattr(bench, "_run_child_all", fake_child_all)
    monkeypatch.setattr(bench, "_run_child", fake_child)
    bench.run_bench(steps=4, warmup=1)
    out = _last_json_line(capsys)
    assert len(pair_calls) == 1
    specs = pair_calls[0][pair_calls[0].index("--pair") + 1].split(",")
    assert bench._parse_candidate(specs[0]) == bench.KNOWN_GOOD
    assert bench._parse_candidate(specs[1]) == bench.PAIR_EXPLORE
    oks = [a for a in out["attempts"] if a["ok"]]
    assert len(oks) >= 2
    tags = {a["config"] for a in oks}
    assert "bfloat16/b16/remat=False" in tags
    assert "bfloat16/b24/remat=True" in tags
    # headline = best of the measured configs
    assert out["value"] == 16.1


def test_pair_child_killed_midway_keeps_first_result(bench, monkeypatch,
                                                     capsys):
    """A pair child killed during config 2 must still deliver config 1's
    measurement (it was printed before config 2 started)."""
    def fake_child_all(args, timeout_s, extend_to_s=None):
        if "--pair" not in args:
            return 1, [], ""
        spec1 = args[args.index("--pair") + 1].split(",")[0]
        res = _fake_result(16.1)
        res["spec"] = spec1
        return None, [res], ""  # rc None = parent killed the child

    monkeypatch.setattr(bench, "_run_child_all", fake_child_all)
    monkeypatch.setattr(
        bench, "_run_child",
        lambda args, t: (0, {}, "") if "--extras" in args else (1, None, ""))
    bench.run_bench(steps=4, warmup=1)
    out = _last_json_line(capsys)
    assert out["value"] == 16.1
    kg = [a for a in out["attempts"]
          if a["config"] == "bfloat16/b16/remat=False"]
    assert kg and kg[0]["ok"]
    b24 = [a for a in out["attempts"]
           if a["config"] == "bfloat16/b24/remat=True"]
    assert b24 and not b24[0]["ok"] and "TIMEOUT" in b24[0]["error"]
