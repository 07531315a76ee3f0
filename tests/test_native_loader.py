"""Native C++ loader: equivalence with the pandas path (skipped if unbuilt)."""

import numpy as np
import pytest

from hybrid_ode_tpu.data.native_loader import native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="libfastwindow.so not built")


def test_native_matches_pandas(tmp_path):
    from tests.test_training import make_test_csv
    from hybrid_ode_tpu.data.dataset import create_data_arrays

    path = make_test_csv(tmp_path / "cohort.csv", n_subjects=4, n_points=50)
    a = create_data_arrays(str(path), sequence_length=20, stride=10, use_native=True)
    b = create_data_arrays(str(path), sequence_length=20, stride=10, use_native=False)
    assert len(a) == len(b)
    np.testing.assert_allclose(a.observations, b.observations, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a.time_points, b.time_points, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a.mask, b.mask)
    np.testing.assert_array_equal(a.subject_ids, b.subject_ids)


def test_native_handles_nan(tmp_path):
    from tests.test_training import make_test_csv
    import pandas as pd
    from hybrid_ode_tpu.data.dataset import create_data_arrays

    path = make_test_csv(tmp_path / "nan.csv", n_subjects=1, n_points=30)
    df = pd.read_csv(path)
    df.loc[5, "glucose_mmol_L"] = np.nan
    df.to_csv(path, index=False)
    ds = create_data_arrays(str(path), sequence_length=20, stride=10, use_native=True)
    assert ds.mask[0, 5] == 0.0
    assert np.isfinite(ds.observations).all()
