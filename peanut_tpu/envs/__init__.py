from .fake import FakeNavEnv

try:  # habitat is optional (only inside the challenge docker image)
    from .habitat_adapter import HabitatEnvAdapter  # noqa: F401
    HAS_HABITAT = True
except ImportError:
    HAS_HABITAT = False

__all__ = ["FakeNavEnv", "HAS_HABITAT"]
