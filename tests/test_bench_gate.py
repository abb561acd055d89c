"""The bench regression gate must be box-factor-blind (VERDICT r5
'What's wrong' #2): a uniformly loaded box reports ~zero regressions,
while a genuine per-query plan regression still flags."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)


def _load_find_regressions():
    import ast

    src = open(spec.origin).read()
    tree = ast.parse(src)
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "find_regressions"
    )
    mod = ast.Module(body=[fn], type_ignores=[])
    ns: dict = {}
    exec(compile(mod, spec.origin, "exec"), ns)  # noqa: S102
    return ns["find_regressions"]


def test_uniform_box_load_reports_nothing():
    find = _load_find_regressions()
    prior = {"sf": 0.1, "queries": {f"q{i}": 1.0 + i % 5 for i in range(40)}}
    loaded = {n: 2.1 * t for n, t in prior["queries"].items()}
    assert find(prior, loaded, 0.1) == {}


def test_real_plan_regression_still_flags_under_load():
    find = _load_find_regressions()
    prior = {"sf": 0.1, "queries": {f"q{i}": 1.0 + i % 5 for i in range(40)}}
    loaded = {n: 2.0 * t for n, t in prior["queries"].items()}
    loaded["q3"] = prior["queries"]["q3"] * 2.0 * 3.0  # 3x plan regression
    got = find(prior, loaded, 0.1)
    assert set(got) == {"q3"}


def test_faster_box_never_excuses_a_slowdown():
    find = _load_find_regressions()
    prior = {"sf": 0.1, "queries": {f"q{i}": 2.0 for i in range(40)}}
    now = {n: 1.0 for n in prior["queries"]}  # box got 2x faster
    now["q7"] = 3.5  # 1.75x slower than prior in absolute terms
    got = find(prior, now, 0.1)
    assert set(got) == {"q7"}


def test_sf_mismatch_is_silent():
    find = _load_find_regressions()
    prior = {"sf": 0.01, "queries": {"a": 1.0}}
    assert find(prior, {"a": 9.0}, 0.1) == {}


def test_median_baseline_preferred_over_min():
    """VERDICT r7 item 9: an elementwise best-of-N baseline reads low
    against any single fresh run, firing the gate on noise. When the
    stored detail carries queries_median, the gate must compare against
    it — a run that matches the medians reports nothing even though it
    is ~1.6x the stored mins."""
    find = _load_find_regressions()
    mins = {f"q{i}": 1.0 for i in range(40)}
    medians = {n: 1.6 for n in mins}
    prior = {"sf": 0.1, "queries": mins, "queries_median": medians}
    fresh = {n: 1.7 for n in mins}  # typical run, near the medians
    assert find(prior, fresh, 0.1) == {}
    # a genuine plan regression still flags against the median leg
    fresh["q5"] = 1.6 * 3.0
    assert set(find(prior, fresh, 0.1)) == {"q5"}


def test_caller_gates_fresh_median_not_min():
    """ADVICE r8: the stored baseline leg is the per-query median, so the
    fresh leg must be the run's median too — min-vs-median is biased low
    on the fresh side at repeat>1 and can mask a real regression. Pin
    the call site: find_regressions receives the medians dict."""
    import ast

    src = open(spec.origin).read()
    calls = [
        n
        for n in ast.walk(ast.parse(src))
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Name)
        and n.func.id == "find_regressions"
    ]
    assert calls, "find_regressions is never called in bench.py"
    for call in calls:
        fresh_arg = call.args[1]
        assert isinstance(fresh_arg, ast.Name) and fresh_arg.id == "medians"
