"""Shared helper for scripts (and tests) that load sibling scripts.

The measured-workflow scripts are standalone files, not package modules, so
composing them (cv_generalization reuses evaluate's metrics and ab_orbit's
training recipe) needs an importlib file loader.  This is the ONE copy —
keep it here so path handling / sys.modules behavior can't drift between
per-file duplicates.
"""
import importlib.util
import os


def load_sibling(name: str):
    """Load scripts/<name>.py as a module (registered under a dxvae_ prefix
    so repeated loads in one process reuse module identity)."""
    import sys

    mod_name = f"dxvae_script_{name}"
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        mod_name, os.path.join(here, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    try:
        spec.loader.exec_module(mod)
    except BaseException:
        del sys.modules[mod_name]
        raise
    return mod
