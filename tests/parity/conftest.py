"""Parity-suite fixtures: TF reference on CPU, deterministic seeds."""

import os

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tf():
    tf = pytest.importorskip("tensorflow")
    tf.random.set_seed(0)
    return tf


def assert_close(ours, theirs, atol=1e-4, label=""):
    ours = np.asarray(ours, dtype=np.float32)
    theirs = np.asarray(theirs, dtype=np.float32)
    assert ours.shape == theirs.shape, f"{label}: {ours.shape} vs {theirs.shape}"
    diff = np.max(np.abs(ours - theirs))
    assert diff <= atol, f"{label}: max |diff| = {diff} > {atol}"
