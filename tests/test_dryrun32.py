"""In-tree artifact for the 32-virtual-device multichip claim (VERDICT r2
item 8): dryrun_multichip(32) self-provisions a 32-device virtual CPU mesh
in a subprocess and runs one full sharded output-adapt train step."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import dryrun_multichip  # noqa: E402

import pytest

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only


def test_dryrun_multichip_32_devices():
    # The pytest process holds an 8-device CPU backend (conftest), so the
    # entry point re-execs itself on a 32-device mesh.
    dryrun_multichip(32)
