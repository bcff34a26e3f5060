"""Model layer: the OccNeRF network and its pluggable submodules."""

from .. import registry
from ..config import cfg


def create_network(config=None):
    """Resolve ``cfg.network_module`` through the registry
    (reference `core/nets/create_network.py:12`)."""
    network_cls = registry.resolve("network", cfg.network_module)
    from .network import NetworkConfig
    return network_cls(config or NetworkConfig.from_cfg())
