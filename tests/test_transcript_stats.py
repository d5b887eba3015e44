"""conversation_stats (kgray.ops.transcripts): per-conversation rollup
must be exact when a conversation's turns span input blocks."""

import pandas as pd
import ray.data

from kgray.ops.transcripts import conversation_stats


def _frame() -> pd.DataFrame:
    base = pd.Timestamp("2024-03-01 08:00:00")
    rows = [
        # conv A: user/assistant/tool cycle, 65s span, one tool call
        ("A", 0, "user", "hello world", "", base),
        ("A", 1, "assistant", "hi", "", base + pd.Timedelta(seconds=5)),
        ("A", 2, "tool", "ran search", "search", base + pd.Timedelta(seconds=65)),
        # conv B: single turn
        ("B", 0, "user", "only turn", "", base),
    ]
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def test_conversation_stats_exact(ray_session):
    out = (
        conversation_stats(ray.data.from_pandas(_frame()))
        .to_pandas()
        .set_index("conv_id")
    )
    a = out.loc["A"]
    assert (a["n_turns"], a["n_user"], a["n_assistant"], a["n_tool"]) == (3, 1, 1, 1)
    assert a["n_tool_calls"] == 1
    assert a["n_chars"] == len("hello world") + len("hi") + len("ran search")
    assert a["duration_us"] == 65 * 1_000_000
    b = out.loc["B"]
    assert b["n_turns"] == 1 and b["duration_us"] == 0


def test_conversation_stats_cross_block(ray_session):
    # repartition(4) splits conv A's turns across blocks; the partial
    # combiner must still produce identical totals
    one = conversation_stats(ray.data.from_pandas(_frame())).to_pandas()
    many = conversation_stats(
        ray.data.from_pandas(_frame()).repartition(4)
    ).to_pandas()
    key = lambda df: df.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(one), key(many))
