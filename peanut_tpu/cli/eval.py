"""Habitat Challenge submission entry (reference /root/reference/nav/eval.py).

Drives the agent through habitat.Challenge's external episode loop, local or
remote (gRPC bridge), preserving the reference's CLI contract
(--evaluation local|remote).  Requires the habitat challenge image.
"""

from __future__ import annotations

from ..agent import PeanutAgent
from ..config import NavConfig


class _ChallengeAgent:
    """habitat.Agent-shaped shim over PeanutAgent (duck-typed so this module
    imports without habitat installed)."""

    def __init__(self, agent: PeanutAgent):
        self._agent = agent

    def reset(self):
        self._agent.reset()

    def act(self, observations):
        return self._agent.act(observations)


def main(argv=None):
    import habitat

    cfg = NavConfig.from_args(argv)
    nav_agent = _ChallengeAgent(PeanutAgent(cfg))
    challenge = habitat.Challenge(eval_remote=(cfg.evaluation != "local"))
    challenge.submit(nav_agent)


if __name__ == "__main__":
    main()
