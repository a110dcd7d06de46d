import logging

import pytest
import ray

from jerex_ray.runtime import configure_data_context


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    configure_data_context()
    yield
    ray.shutdown()
