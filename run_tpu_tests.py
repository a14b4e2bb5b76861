"""Run the accelerator-only validation suite on the real TPU chip.

The pytest suite pins the CPU backend (tests/conftest.py) so the Pallas
kernel tests skip there; this runner executes them — plus an on-chip
cross-engine consistency pass — against the actual accelerator.

    python run_tpu_tests.py
"""

import re
import sys


def _run_test_file(path, names, param_calls=()):
    src = open(path).read()
    src = re.sub(r"pytestmark = pytest\.mark\.skipif\([^)]*\)\n", "", src,
                 flags=re.S)
    ns = {}
    exec(compile(src, path, "exec"), ns)
    for name in names:
        print(f"  {name} ...", end=" ", flush=True)
        ns[name]()
        print("OK")
    for name, args in param_calls:
        print(f"  {name}{args} ...", end=" ", flush=True)
        ns[name](*args)
        print("OK")


def main():
    import jax

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}")
    if backend == "cpu":
        print("ERROR: no accelerator backend — nothing to validate here")
        return 1

    print("pallas kernel tests:")
    _run_test_file("tests/test_pallas_fill.py", [
        "test_pallas_matches_xla_scores",
        "test_pallas_2piece_matches_xla_scores",
    ], param_calls=[("test_pallas_free_ends_matches_xla", (True, True)),
                    ("test_pallas_free_ends_matches_xla", (True, False)),
                    ("test_pallas_free_ends_matches_xla", (False, True))])

    print("on-chip consistency sweep:")
    sys.path.insert(0, "tests")
    import test_consistency as tc

    for seed in (101, 202):
        print(f"  one-piece seed {seed} ...", end=" ", flush=True)
        tc.test_all_engines_agree_one_piece(seed)
        print("OK")
    for seed in (404,):
        print(f"  two-piece seed {seed} ...", end=" ", flush=True)
        tc.test_all_engines_agree_two_piece(seed)
        print("OK")

    print("all TPU validations passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
