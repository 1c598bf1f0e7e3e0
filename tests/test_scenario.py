import pytest

from polara_tpu.data.scenario import (Scenario, plan_update, validate_config,
                                      UpdateRule)


def plan(state, changed, hsz, trt, ws, rnd=False):
    return plan_update(state, frozenset(changed), hsz, trt, ws, rnd)


def test_initial_split_defaults_is_warm_start():
    state, rule = plan(None, {"init"}, 3, 0.2, True)
    assert state == Scenario.WARM_START
    assert rule.full_update and not rule.test_update


def test_initial_split_known_users():
    state, rule = plan(None, {"init"}, 3, 0.2, False)
    assert state == Scenario.KNOWN_USERS
    assert rule.full_update


def test_initial_split_variants():
    assert plan(None, {"init"}, 0, 0, False)[0] == Scenario.TRAIN_ONLY
    assert plan(None, {"init"}, 0, 0.2, False)[0] == Scenario.TESTSET_ONLY
    assert plan(None, {"init"}, 3, 0, False)[0] == Scenario.HOLDOUT_ONLY


def test_warm_start_holdout_change_is_test_update():
    # in state 4, resampling the holdout does not touch training data
    state, rule = plan(Scenario.WARM_START, {"holdout_size"}, 5, 0.2, True)
    assert state == Scenario.WARM_START
    assert rule.test_update and not rule.full_update


def test_warm_start_fold_change_is_full_update():
    state, rule = plan(Scenario.WARM_START, {"test_fold"}, 3, 0.2, True)
    assert state == Scenario.WARM_START
    assert rule.full_update


def test_warm_start_test_sample_change_is_test_update():
    state, rule = plan(Scenario.WARM_START, {"test_sample"}, 3, 0.2, True)
    assert state == Scenario.WARM_START
    assert rule.test_update and not rule.full_update


def test_warm_start_drop_holdout_keeps_fold():
    # hsz -> 0 with the fold untouched: only test data shrinks
    state, rule = plan(Scenario.WARM_START, {"holdout_size"}, 0, 0.2, True)
    assert state == Scenario.TESTSET_ONLY
    assert rule.test_update and not rule.full_update


def test_known_users_holdout_change_is_full_update():
    # state 3 holdout lives inside training rows -> training changes
    state, rule = plan(Scenario.KNOWN_USERS, {"holdout_size"}, 5, 0.2, False)
    assert state == Scenario.KNOWN_USERS
    assert rule.full_update


def test_toggle_warm_start_on():
    state, rule = plan(Scenario.KNOWN_USERS, {"warm_start"}, 3, 0.2, True)
    assert state == Scenario.WARM_START
    assert rule.full_update


def test_toggle_warm_start_on_from_testset_only():
    state, rule = plan(Scenario.TESTSET_ONLY,
                       {"warm_start", "holdout_size"}, 3, 0.2, True)
    assert state == Scenario.WARM_START
    assert rule.test_update and not rule.full_update


def test_toggle_warm_start_off():
    state, rule = plan(Scenario.WARM_START, {"warm_start"}, 3, 0.2, False)
    assert state == Scenario.KNOWN_USERS
    assert rule.full_update


def test_no_change_is_noop():
    state, rule = plan(Scenario.KNOWN_USERS, set(), 3, 0.2, False)
    assert state == Scenario.KNOWN_USERS
    assert not rule.any


def test_permute_tops_triggers_holdout_resample():
    state, rule = plan(Scenario.HOLDOUT_ONLY, {"permute_tops"}, 3, 0, False)
    assert rule.full_update  # state 2 holdout comes out of training rows


def test_negative_prediction_ignored_under_random_holdout():
    state, rule = plan(Scenario.KNOWN_USERS, {"negative_prediction"},
                       3, 0.2, False, rnd=True)
    assert not rule.any


def test_validate_config_errors():
    with pytest.raises(ValueError):
        validate_config(0, 0.2, 1, True)   # warm start needs holdout
    with pytest.raises(ValueError):
        validate_config(0, 0.2, 1, False)  # testset without holdout
    with pytest.raises(ValueError):
        validate_config(3, 1.0, 1, False)  # ratio must be < 1
    with pytest.raises(ValueError):
        validate_config(3, 0.5, 3, False)  # fold out of range
    validate_config(3, 0.2, 5, True)


def test_all_transitions_produce_valid_states():
    props = ["test_ratio", "test_fold", "test_sample", "warm_start",
             "holdout_size", "permute_tops", "random_holdout",
             "negative_prediction"]
    states = [None, 1, 11, 2, 3, 4]
    configs = [(0, 0, False), (0, 0.2, False), (3, 0, False),
               (3, 0.2, False), (3, 0.2, True)]
    for state in states:
        for hsz, trt, ws in configs:
            for prop in props:
                new_state, rule = plan(state, {prop}, hsz, trt, ws)
                assert new_state in (None, 1, 11, 2, 3, 4)
                assert isinstance(rule, UpdateRule)
