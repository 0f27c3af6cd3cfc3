"""Per-category NSW normalization fixtures (the reference's nsw_test cases,
utils/text_norm.py:722-737, adapted to this normalizer's documented
divergences — VERDICT round-1 missing #5)."""

from dicttts_tpu.text.text_norm import chn2num, digits2chn, normalize_text, num2chn


def test_fixed_phone():
    out = normalize_text("固话0595-23865596")
    assert "零五九五" in out and "二三八六五五九六" in out
    assert not any(c.isdigit() for c in out)


def test_mobile_phone_with_country_code():
    out = normalize_text("手机+86 19859213959")
    assert "一九八五九二一三九五九" in out
    assert not any(c.isdigit() for c in out)


def test_fraction():
    assert normalize_text("32/76") == "七十六分之三十二"


def test_percentage():
    assert normalize_text("80.03%") == "百分之八十点零三"
    assert normalize_text("有62％的概率") == "有百分之六十二的概率"


def test_digit_code():
    out = normalize_text("编号31520181154418")
    assert out == "编号" + digits2chn("31520181154418")


def test_cardinal_decimal():
    assert normalize_text("2983.07克") == "两千九百八十三点零七克"


def test_date_full():
    assert normalize_text("1999年2月20日") == "一九九九年二月二十日"


def test_date_two_digit_year():
    assert normalize_text("09年3月15号") == "零九年三月十五号"


def test_money():
    assert normalize_text("34.5元") == "三十四点五元"
    assert normalize_text("12块5") == "十二块五"
    assert normalize_text("40多块钱") == "四十多块钱"
    assert normalize_text("20.1万") == "二十点一万"


def test_particular_letters():
    assert normalize_text("O2O和B2C") == "O2O和B2C"


def test_quantifier():
    assert normalize_text("3456万吨") == "三千四百五十六万吨"
    assert normalize_text("今天吃了115个小笼包") == "今天吃了一百一十五个小笼包"


def test_liang_selection():
    assert normalize_text("200个") == "两百个"
    assert normalize_text("22个") == "二十二个"


def test_chn2num_roundtrip():
    for n in (0, 2, 15, 22, 105, 200, 1234, 2000, 10000, 220000, 100000001):
        assert chn2num(num2chn(n)) == n
    assert chn2num("两百三十") == 230
    assert chn2num("一九九九") == 1999  # digit-string reading
