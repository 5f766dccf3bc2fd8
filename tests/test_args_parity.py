"""CLI flag parity against the REFERENCE's actual argparse surface.

Loads /root/reference/utils/args.py (pure sys+argparse, importable without
torch) and asserts every reference flag exists here with identical option
strings, defaults, choices, nargs and required-ness, for both learners
(reference: utils/args.py:12-192). Extra TPU-native flags are allowed but
must come from a declared allowlist so protocol drift stays deliberate.

Skips cleanly if the reference tree is not present (e.g. a user's clone)."""
import argparse
import importlib.util
import os

import pytest

REF_ARGS = "/root/reference/utils/args.py"

# Flags this framework adds on top of the reference surface (TPU-native
# features; every addition must be listed here deliberately).
EXTRA_FLAGS = {
    "--data_parallel", "--task_parallel", "--num_hosts", "--host_index",
    "--resume_from", "--compute_dtype", "--frame_cache", "--batch_videos",
    "--no-batch_videos", "--metrics", "--profile_dir", "--num_data_threads",
    "--prefetch_tasks", "--episode_prefetch", "--host_normalize",
    "--pretrained_extractor_path", "--compile_cache",
}


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_args", REF_ARGS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _capture_parser(call):
    """Run a parse_args()-style callable and capture the ArgumentParser it
    builds, without letting it exit (reference parse_args both builds the
    parser and parses sys.argv)."""
    captured = []
    orig = argparse.ArgumentParser.parse_args

    def spy(self, *a, **k):
        captured.append(self)
        # Short-circuit: never actually parse (the reference would read
        # sys.argv and post-process the namespace).
        raise _Captured()

    class _Captured(Exception):
        pass

    argparse.ArgumentParser.parse_args = spy
    try:
        call()
    except _Captured:
        pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    assert captured, "parser was never built"
    return captured[0]


def _actions_by_flag(parser):
    out = {}
    for act in parser._actions:
        if isinstance(act, argparse._HelpAction):
            continue
        for opt in act.option_strings:
            if opt.startswith("--"):
                out[opt] = act
    return out


@pytest.mark.skipif(not os.path.exists(REF_ARGS),
                    reason="reference tree not present")
@pytest.mark.parametrize("learner", ["default", "multi-step-learner"])
def test_flag_surface_matches_reference(learner):
    from orbit_tpu.utils.args import build_parser

    ref_mod = _load_reference_module()
    ref_parser = _capture_parser(lambda: ref_mod.parse_args(learner))
    ref_flags = _actions_by_flag(ref_parser)
    our_flags = _actions_by_flag(build_parser(learner))

    missing = sorted(set(ref_flags) - set(our_flags))
    assert not missing, f"reference flags missing here: {missing}"

    undeclared = sorted(set(our_flags) - set(ref_flags) - EXTRA_FLAGS)
    assert not undeclared, (
        f"flags added without being declared in EXTRA_FLAGS: {undeclared}")

    mismatches = []
    for opt, ref_act in sorted(ref_flags.items()):
        ours = our_flags[opt]
        for field in ("default", "nargs", "required"):
            rv, ov = getattr(ref_act, field), getattr(ours, field)
            # argparse stores tuples/lists interchangeably for nargs
            if isinstance(rv, (list, tuple)) and isinstance(ov, (list, tuple)):
                rv, ov = list(rv), list(ov)
            if rv != ov:
                mismatches.append(f"{opt}.{field}: ref={rv!r} here={ov!r}")
        # choices may deliberately widen (e.g. --frame_size adds 84 for
        # small-frame smoke runs) but every reference choice must be accepted
        rc, oc = ref_act.choices, ours.choices
        if rc is not None and (oc is None or not set(rc) <= set(oc)):
            mismatches.append(f"{opt}.choices: ref={rc!r} not a subset "
                              f"of here={oc!r}")
        # store_true flags must stay store_true
        if isinstance(ref_act, argparse._StoreTrueAction) != isinstance(
                ours, argparse._StoreTrueAction):
            mismatches.append(f"{opt}: store_true-ness differs")
    assert not mismatches, "\n".join(mismatches)


@pytest.mark.skipif(not os.path.exists(REF_ARGS),
                    reason="reference tree not present")
def test_issue_macro_expansion_matches_reference():
    from orbit_tpu.utils import args as our_args

    ref_mod = _load_reference_module()
    for filt in (["no_issues"], ["mixed_issues"], ["blur_issue"],
                 ["no_issues", "mixed_issues"], []):
        assert our_args.expand_issues(list(filt)) == \
            ref_mod.expand_issues(list(filt)), filt
    assert our_args.ALL_FRAME_ANNOTATION_OPTIONS == \
        ref_mod.ALL_FRAME_ANNOTATION_OPTIONS
