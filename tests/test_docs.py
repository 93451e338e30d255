"""Documentation consistency: the generated config-key reference must
stay in sync with the parser's option tables."""
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_reference_up_to_date():
    gen_path = os.path.join(REPO, 'docs', 'generate_config_reference.py')
    spec = importlib.util.spec_from_file_location('gen_cfg_ref', gen_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    expected = mod.generate()
    with open(os.path.join(REPO, 'docs', 'CONFIG_REFERENCE.md')) as f:
        on_disk = f.read()
    assert on_disk == expected, (
        'docs/CONFIG_REFERENCE.md is stale: re-run '
        'python docs/generate_config_reference.py'
    )


def test_config_reference_covers_all_keys():
    from pyratbay_tpu.config import parser as P
    with open(os.path.join(REPO, 'docs', 'CONFIG_REFERENCE.md')) as f:
        text = f.read()
    all_keys = (set(P._STR_KEYS) | set(P._INT_KEYS)
                | set(P._FLOAT_KEYS) | set(P._BOOL_KEYS)
                | set(P._ARRAY_KEYS))
    missing = [k for k in sorted(all_keys) if f'`{k}`' not in text]
    assert not missing, f'undocumented config keys: {missing}'
