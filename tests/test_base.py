"""Global-state hygiene (reference test/test_base.py:10-22: importing the
library must not change the framework's global dtype settings)."""

import subprocess
import sys


def test_import_does_not_mutate_global_config():
    """Importing gptorch_tpu in a fresh interpreter must leave x64 OFF and
    must not force a platform."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import gptorch_tpu\n"
        "assert not jax.config.jax_enable_x64, 'import flipped x64'\n"
        "import jax.numpy as jnp\n"
        "assert jnp.ones(2).dtype == jnp.float32\n"
        "print('ok')\n"
    )
    result = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=__file__.rsplit("/", 2)[0],
        timeout=300,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "ok" in result.stdout


def test_default_float_follows_x64():
    import jax

    from gptorch_tpu import settings

    # conftest enables x64 for the suite
    assert jax.config.jax_enable_x64
    assert settings.default_float().__name__ == "float64"
