"""Test configuration: force CPU with a virtual 8-device mesh.

Tests must not depend on TPU availability; multi-chip sharding logic is
validated on a host-platform mesh (SURVEY.md section 4 "multi-host tests on
CPU ... fake meshes").
"""
import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the TPU
# tunnel), which must not be shared by test processes -- the tunnel
# serializes clients and a second process deadlocks. Tests always run on the
# host platform with a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
