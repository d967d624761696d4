"""Session-level engine registry — the analog of the reference's 10
static instances `AreaCityQuery.Instances[0-9]`
(/root/reference/AreaCityQuery.java:62-66): multiple named
boundary/tile datasets served side by side (e.g. instance 0 =
China admin regions, instance 1 = world continents), addressed by name
exactly as the reference's HTTP layer routes `/{instance}/verb`
(Test_HttpApiServer.java:343-347)."""
from __future__ import annotations

from .engine import SpatialEngine

_REGISTRY: dict[str, SpatialEngine] = {}


def register(name: str, engine: SpatialEngine) -> SpatialEngine:
    _REGISTRY[str(name)] = engine
    return engine


def get(name: str) -> SpatialEngine:
    try:
        return _REGISTRY[str(name)]
    except KeyError:
        raise KeyError(
            f"no engine registered as {name!r}; have {sorted(_REGISTRY)}"
        ) from None


def instances() -> dict[str, SpatialEngine]:
    return dict(_REGISTRY)


def unregister(name: str) -> None:
    _REGISTRY.pop(str(name), None)
