from . import core, distance, geojson, predicates, wkb, wkt  # noqa: F401
