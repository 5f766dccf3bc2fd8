"""--compile_cache: persistent XLA compilation cache plumbing."""
import os

import jax


def test_enable_compile_cache_sets_config(tmp_path):
    from orbit_tpu.utils.profiling import enable_compile_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        target = str(tmp_path / "sub" / "xla")
        got = enable_compile_cache(target)
        assert got == target and os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        assert enable_compile_cache("") is None
        assert enable_compile_cache(None) is None
    finally:
        # restore the suite-wide cache (conftest) so later tests stay warm
        jax.config.update("jax_compilation_cache_dir", old)


def test_cache_flag_reaches_learner(orbit_fixture_tree, tmp_path_factory):
    from tests.test_learners import make_args
    from orbit_tpu.learners import SingleStepLearner

    root = tmp_path_factory.mktemp("root")
    src = os.path.realpath(orbit_fixture_tree)
    for mode in ("train", "validation", "test"):
        os.symlink(src, root / mode)

    old = jax.config.jax_compilation_cache_dir
    cache_dir = str(tmp_path_factory.mktemp("xla_cache") / "c")
    try:
        args = make_args(str(root), str(tmp_path_factory.mktemp("ck")),
                         mode="test", compile_cache=cache_dir)
        learner = SingleStepLearner(args)
        assert jax.config.jax_compilation_cache_dir == cache_dir
        with open(os.path.join(learner.checkpoint_dir, "log.txt")) as f:
            assert "persistent compile cache" in f.read()
        learner.logfile.close()
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
