"""Stub: pyiceberg's config-file YAML loader — unused when no .pyiceberg.yaml exists."""
class YAMLError(Exception):
    pass

def load(*a, **k):
    raise YAMLError("strictyaml stub: yaml config files unsupported in this sandbox")
