"""Tools: VOC-XML -> annotation converter (reference xml_to_txt.py:1-42
equivalent, as a callable function instead of an import-time script)."""

from yolov4tpu.tools.xml_to_txt import convert

VOC_XML = """<annotation>
  <filename>scene_{i}.jpg</filename>
  <object>
    <name>{cls}</name>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>110</xmax><ymax>220</ymax></bndbox>
  </object>
  <object>
    <name>unknown_class</name>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>2</xmax><ymax>2</ymax></bndbox>
  </object>
</annotation>
"""


def test_convert_voc_xml(tmp_path):
    xml_dir = tmp_path / "xmls"
    xml_dir.mkdir()
    for i, cls in enumerate(["dog", "cat", "dog"]):
        (xml_dir / f"f{i}.xml").write_text(VOC_XML.format(i=i, cls=cls))
    out = tmp_path / "anno.txt"
    n = convert(str(xml_dir), ["cat", "dog"], str(out))
    assert n == 3
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "scene_0.jpg 10,20,110,220,1"
    assert lines[1] == "scene_1.jpg 10,20,110,220,0"
    # Unknown class names are skipped, not errors.
    assert all("unknown" not in l for l in lines)


def test_convert_missing_filename_falls_back(tmp_path):
    xml_dir = tmp_path / "xmls"
    xml_dir.mkdir()
    xml = ("<annotation><object><name>a</name><bndbox>"
           "<xmin>0</xmin><ymin>0</ymin><xmax>5</xmax><ymax>5</ymax>"
           "</bndbox></object></annotation>")
    (xml_dir / "imgname.xml").write_text(xml)
    out = tmp_path / "anno.txt"
    assert convert(str(xml_dir), ["a"], str(out), img_ext=".png") == 1
    assert out.read_text().startswith("imgname.png ")
