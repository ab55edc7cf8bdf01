import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# first-call kernel/regex compilation can exceed hypothesis's 200ms deadline
# and read as a flaky falsification — wall-clock is not a property under test
try:
    from hypothesis import settings as _hs

    _hs.register_profile("no-deadline", deadline=None)
    _hs.load_profile("no-deadline")
except ImportError:
    pass


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """100-doc seeded synthetic corpus (input_hint schema) + media store."""
    from documentprocessor_ray.corpus import generate_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    docs_dir, media_dir = generate_corpus(out, n_docs=60, seed=42, heavy_frac=0.05,
                                          num_partitions=4)
    return docs_dir, media_dir


# The reference's canonical 14-word receipt fixture, pixel boxes on 400x600
# (Ocr/tests/conftest.py:37-54).
SAMPLE_WORDS = [
    {"text": "GROCERY", "box": [100, 50, 300, 100], "confidence": 0.98},
    {"text": "STORE", "box": [100, 100, 250, 150], "confidence": 0.96},
    {"text": "Date:", "box": [50, 200, 120, 230], "confidence": 0.95},
    {"text": "01/15/2024", "box": [130, 200, 280, 230], "confidence": 0.94},
    {"text": "Milk", "box": [50, 300, 150, 330], "confidence": 0.97},
    {"text": "$3.99", "box": [300, 300, 380, 330], "confidence": 0.96},
    {"text": "Bread", "box": [50, 350, 150, 380], "confidence": 0.95},
    {"text": "$2.50", "box": [300, 350, 380, 380], "confidence": 0.94},
    {"text": "Subtotal", "box": [50, 450, 180, 480], "confidence": 0.97},
    {"text": "$6.49", "box": [300, 450, 380, 480], "confidence": 0.95},
    {"text": "Tax", "box": [50, 490, 100, 520], "confidence": 0.96},
    {"text": "$0.52", "box": [300, 490, 380, 520], "confidence": 0.94},
    {"text": "Total", "box": [50, 540, 130, 570], "confidence": 0.98},
    {"text": "$7.01", "box": [300, 540, 380, 570], "confidence": 0.97},
]


@pytest.fixture
def sample_words():
    return [dict(w, box=list(w["box"])) for w in SAMPLE_WORDS]
