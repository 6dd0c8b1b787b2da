import json

import pytest

from multimeditron_tpu.data.preprocessor import run_preprocessors
from multimeditron_tpu.utils.jsonl import JSONLGenerator


@pytest.fixture
def ds():
    datasets = pytest.importorskip("datasets")
    return datasets.Dataset.from_list(
        [{"prompt": f"p{i}", "response": f"r{i}", "extra": i} for i in range(10)]
    )


def test_shuffle_stage(ds):
    out = run_preprocessors(ds, 0, [{"type": "shuffle", "kwargs": {"seed": 1}}])
    assert sorted(out["extra"]) == list(range(10))
    assert out["extra"] != list(range(10))


def test_python_stage_requires_allow_code(ds):
    stages = [{"type": "python", "kwargs": {"func": '{"prompt": data["prompt"]}'}}]
    with pytest.raises(PermissionError):
        run_preprocessors(ds, 0, stages)


def test_python_map_and_filter(ds):
    stages = [
        {
            "type": "python",
            "kwargs": {
                "func": '{"prompt": data["prompt"], "response": data["response"]}',
                "remove_columns": ["extra"],
            },
        },
        {"type": "python-filter", "kwargs": {"func": "idx <= 5"}},
    ]
    out = run_preprocessors(ds, 0, stages, allow_code=True)
    assert len(out) == 6
    assert set(out.column_names) == {"prompt", "response"}


def test_python_multiline(ds):
    stages = [
        {
            "type": "python",
            "kwargs": {
                "func": 'x = data["extra"] * 2\n{"prompt": data["prompt"], "double": x}',
            },
        }
    ]
    out = run_preprocessors(ds, 0, stages, allow_code=True)
    assert out["double"] == [i * 2 for i in range(10)]


def test_python_imports(ds):
    stages = [
        {
            "type": "python",
            "kwargs": {
                "imports": ["math"],
                "func": '{"root": math.sqrt(data["extra"])}',
            },
        }
    ]
    out = run_preprocessors(ds, 0, stages, allow_code=True)
    assert out["root"][4] == 2.0


def test_jsonl_generator_skips_malformed(tmp_path):
    path = tmp_path / "data.jsonl"
    path.write_text('{"a": 1}\nnot json\n\n{"a": 2}\n')
    rows = list(JSONLGenerator(str(path)))
    assert rows == [{"a": 1}, {"a": 2}]
