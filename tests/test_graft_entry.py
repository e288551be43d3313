"""Driver-contract tests: multichip dry-run on the virtual 8-device CPU mesh."""

import jax
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(2)
