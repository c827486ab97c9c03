from __future__ import annotations

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGION_DICT_PATH = os.path.join(
    REPO, "address_semantic_search_ray", "data", "region_dict.parquet"
)
SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def region_dict():
    from address_semantic_search_ray.kernel.regions import RegionDict

    return RegionDict.from_parquet(REGION_DICT_PATH)


@pytest.fixture(scope="session")
def interpreter(region_dict):
    from address_semantic_search_ray.kernel.interpreter import Interpreter

    return Interpreter(region_dict)


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (local, 4 CPUs)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()
