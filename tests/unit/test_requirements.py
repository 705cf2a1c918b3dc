"""Declared dependencies must match what the code imports (VERDICT r2 weak#3:
requirements.txt listed ``tensorboard`` while the trainer imported
``tensorboardX`` — a fresh env built from requirements crashed at
``Trainer.__init__``)."""

from pathlib import Path

REQUIREMENTS = Path(__file__).resolve().parents[2] / "requirements.txt"


def _declared_names():
    names = set()
    for line in REQUIREMENTS.read_text().splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        for sep in (">=", "==", "<=", "~=", ">", "<"):
            if sep in line:
                line = line.split(sep, 1)[0]
                break
        names.add(line.strip())
    return names


def test_tensorboard_writer_import_matches_requirements():
    names = _declared_names()
    assert "tensorboardX" in names, (
        "core/trainer.py imports tensorboardX; requirements.txt must declare it"
    )
    assert "tensorboard" not in names, (
        "requirements.txt must not declare the wrong tensorboard package name"
    )


def test_make_writer_returns_usable_writer(tmp_path):
    from light_unet_tpu.core.trainer import _make_writer

    w = _make_writer(str(tmp_path))
    w.add_scalar("smoke/x", 1.0, 0)
    w.close()


def test_make_writer_degrades_to_noop_without_tensorboard(tmp_path, monkeypatch):
    """A minimal install (no tensorboardX, no torch) must train, not crash."""
    import builtins

    real_import = builtins.__import__

    def blocked(name, *a, **k):
        if name.startswith(("tensorboardX", "torch")):
            raise ImportError(f"blocked for test: {name}")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", blocked)
    from light_unet_tpu.core.trainer import _NullWriter, _make_writer

    w = _make_writer(str(tmp_path))
    assert isinstance(w, _NullWriter)
    w.add_scalar("smoke/x", 1.0, 0)
    w.close()
