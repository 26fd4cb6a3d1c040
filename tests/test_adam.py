"""Adam optimizer tests (reference parity: fused_adam.cpp semantics)."""

import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.ops.adam import (
    BETA1,
    BETA2,
    EPS,
    adam_step,
    init_adam,
    scale_lrs,
    shn_skip_mask,
)


def test_adam_matches_manual(rng):
    p = {"w": jnp.asarray(rng.normal(0, 1, (8, 3)).astype(np.float32))}
    g = {"w": jnp.asarray(rng.normal(0, 1, (8, 3)).astype(np.float32))}
    st = init_adam(p, {"w": 0.1})
    p1, st1 = adam_step(p, g, st)
    m = (1 - BETA1) * np.asarray(g["w"])
    v = (1 - BETA2) * np.asarray(g["w"]) ** 2
    step = 0.1 * np.sqrt(1 - BETA2) / (1 - BETA1)
    expected = np.asarray(p["w"]) - step * m / (np.sqrt(v) + EPS)
    np.testing.assert_allclose(np.asarray(p1["w"]), expected, rtol=1e-4)
    assert int(st1.step_count["w"]) == 1


def test_shn_skip_freezes_params_but_advances_count(rng):
    p = {"shN": jnp.ones((4, 2))}
    g = {"shN": jnp.ones((4, 2))}
    st = init_adam(p, {"shN": 0.1})
    p1, st1 = adam_step(p, g, st, skip=shn_skip_mask(jnp.asarray(500)))
    np.testing.assert_allclose(np.asarray(p1["shN"]), 1.0)  # frozen
    assert int(st1.step_count["shN"]) == 1  # count still advances (ref :66-71)
    p2, st2 = adam_step(p1, g, st1, skip=shn_skip_mask(jnp.asarray(1001)))
    assert not np.allclose(np.asarray(p2["shN"]), 1.0)  # active after 1000


def test_lr_schedule():
    p = {"means": jnp.ones(3), "sh0": jnp.ones(3)}
    st = init_adam(p, {"means": 1.0, "sh0": 1.0})
    st = scale_lrs(st, jnp.asarray(0.5), groups=("means",))
    assert float(st.lr["means"]) == 0.5
    assert float(st.lr["sh0"]) == 1.0


def test_static_skip_matches_traced_skip():
    """static_skip (compile-time shN freeze) must produce the same state as
    the traced skip mask — params/moments unchanged, step count advanced."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(3)
    p = {"shN": jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32)),
         "means": jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))}
    g = {k: jnp.asarray(rng.normal(size=v.shape).astype(np.float32))
         for k, v in p.items()}
    st = init_adam(p, {"shN": 1e-2, "means": 1e-2})
    pa, sa = adam_step(p, g, st, skip={"shN": jnp.asarray(True)})
    pb, sb = adam_step(p, g, st, static_skip=("shN",))
    for k in p:
        np.testing.assert_allclose(np.asarray(pa[k]), np.asarray(pb[k]), rtol=1e-7)
        np.testing.assert_allclose(
            np.asarray(sa.exp_avg[k]), np.asarray(sb.exp_avg[k]), rtol=1e-7
        )
    assert int(sb.step_count["shN"]) == 1
