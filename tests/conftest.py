import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (driver contract)."""
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from information_extraction_system_ray.context import tune_context

    tune_context(quiet=True)
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixdir():
    return FIXDIR
