"""Output sinks: OSM XML and OSM PBF planet files."""
