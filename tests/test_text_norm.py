"""Chinese NSW normalization (behavior target: reference utils/text_norm.py).

The reference vendors chn_text_norm; ours is an original implementation with
the same public surface.  Cases below are hand-derived spoken readings.
"""

import pytest

from diffsvc_tpu.utils.text_norm import NSWNormalizer, chn2num, num2chn


@pytest.mark.parametrize("n,expect", [
    (0, "零"),
    (5, "五"),
    (10, "十"),
    (15, "十五"),
    (20, "二十"),
    (105, "一百零五"),
    (115, "一百一十五"),
    (1005, "一千零五"),
    (1234, "一千二百三十四"),
    (10005, "一万零五"),
    (100000, "十万"),
    (1000500, "一百万零五百"),
    (100050000, "一亿零五万"),
    (123456789, "一亿二千三百四十五万六千七百八十九"),
    (1_0000_0000_0000, "一万亿"),
])
def test_num2chn_integers(n, expect):
    assert num2chn(n) == expect


def test_num2chn_decimal_sign_and_variants():
    assert num2chn("3.14") == "三点一四"
    assert num2chn(-42) == "负四十二"
    assert num2chn("0.50") == "零点五零"
    assert num2chn(123, big=True) == "壹佰贰拾叁"
    assert num2chn(200, alt_two=True) == "两百"
    assert num2chn(22, alt_two=True) == "二十二"  # no 两 before 十
    assert num2chn(20000, traditional=True) == "二萬"
    with pytest.raises(ValueError):
        num2chn("12a")


@pytest.mark.parametrize("text,expect", [
    ("十五", 15),
    ("两百", 200),
    ("一千二百三十四", 1234),
    ("三万五千", 35000),
    ("一亿零五万", 100050000),
    ("一万亿", 1_0000_0000_0000),
    ("负四十二", -42),
    ("壹佰贰拾叁", 123),
])
def test_chn2num(text, expect):
    assert chn2num(text) == expect


def test_roundtrip():
    for n in [0, 7, 10, 19, 99, 100, 101, 110, 1001, 9999, 10000, 10010,
              54321, 1000001, 99999999, 100000001, 12_3456_7890,
              # 万亿-scale with later 亿/万 sections (regression: the second
              # 亿 must collapse additively, not rescale the total)
              59_1927_6787_4690, 9_3712_3100_2986, 10**16 - 1]:
        assert chn2num(num2chn(n)) == n, n
    with pytest.raises(ValueError):
        num2chn(10 ** 16)  # beyond the supported 万亿 group


def test_nsw_cardinal_and_decimal():
    out = NSWNormalizer("共有1234人，平均3.5分").normalize()
    assert out == "共有一千二百三十四人，平均三点五分"


def test_nsw_percentage_and_fraction():
    assert NSWNormalizer("涨了95%").normalize() == "涨了百分之九十五"
    assert NSWNormalizer("完成了2/3").normalize() == "完成了三分之二"
    assert NSWNormalizer("百分之15").normalize() == "百分之十五"


def test_nsw_telephone_reads_digits_with_yao():
    out = NSWNormalizer("电话13812345678").normalize()
    assert out == "电话幺三八幺二三四五六七八"
    out = NSWNormalizer("固话0595-23861234").normalize()
    assert out == "固话零五九五，二三八六幺二三四"


def test_nsw_date():
    out = NSWNormalizer("2019年5月29日发布").normalize()
    assert out == "二零一九年五月二十九日发布"
    assert NSWNormalizer("30号见").normalize() == "三十号见"
    assert NSWNormalizer("1997年").normalize() == "一九九七年"


def test_nsw_money():
    assert NSWNormalizer("卖13.5元").normalize() == "卖十三点五元"
    assert NSWNormalizer("￥200").normalize() == "两百元"


def test_nsw_long_digit_string_read_digitwise():
    out = NSWNormalizer("编号1000000000000001").normalize()
    assert out == "编号幺零零零零零零零零零零零零零零幺"


def test_nsw_huge_number_with_decimal_degrades_gracefully():
    # integer part beyond num2chn's unit table (17+ digits) combined with
    # a decimal point: the frontend must not raise — it falls back to a
    # digit-by-digit reading like the bare long-digit-run path
    out = NSWNormalizer("编号12345678901234567.5元").normalize()
    assert "点五" in out and "二三四五六七八九" in out
    neg = NSWNormalizer("-99999999999999999").normalize()
    assert neg.startswith("负")


def test_nsw_never_crashes_on_random_numeric_text():
    """Property: normalize() must return a str for ANY numeric-ish text —
    a TTS frontend crash takes the whole pipeline down. Sweeps digit runs
    of every length 1..40 in each rule context (bare, money, percent,
    fraction, date-ish, signed, decimal)."""
    import numpy as np

    rng = np.random.RandomState(0)
    for n in range(1, 41):
        digits = "".join(rng.choice(list("0123456789")) for _ in range(n))
        for tpl in ("{}", "{}元", "{}%", "3/{}", "{}/7", "-{}", "{}.25",
                    "-{}.5元", "共{}个", "{}年5月1日"):
            text = tpl.format(digits)
            out = NSWNormalizer(text).normalize()
            assert isinstance(out, str) and out, (text, out)
            assert not any(c.isdigit() for c in out) or "年" in text, (
                text, out)
