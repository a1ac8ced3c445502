"""Generate the mesh assets used by test_mesh_gt.py (run once, outputs
committed).

The shapes mirror the analytic eval fixtures (sim/world.py) the same way the
reference's Gazebo assets mirror its worlds: a unit cube OBJ (cardboard box
and chairs under per-axis scaling), a binary STL cone in centimeter units
(UNIT_SCALE=0.01 like eval_cone.py:28), and a COLLADA unit cube whose
polylist uses quads (exercises fan triangulation + multi-input strides).
"""

import os
import struct

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def write_unit_cube_obj(path):
    v = [(x, y, z) for x in (-0.5, 0.5) for y in (-0.5, 0.5)
         for z in (-0.5, 0.5)]
    # 12 triangles, CCW outward
    f = [(1, 2, 4), (1, 4, 3), (5, 7, 8), (5, 8, 6),    # x- x+
         (1, 5, 6), (1, 6, 2), (3, 4, 8), (3, 8, 7),    # y- y+
         (1, 3, 7), (1, 7, 5), (2, 6, 8), (2, 8, 4)]    # z- z+
    with open(path, "w") as out:
        out.write("# unit cube\n")
        for x, y, z in v:
            out.write(f"v {x} {y} {z}\n")
        for a, b, c in f:
            out.write(f"f {a} {b} {c}\n")


def write_cone_stl(path, radius_cm=16.0, height_cm=50.0, segments=96):
    """Binary STL cone: base at z=0, apex at z=height (centimeter units)."""
    tris = []
    apex = (0.0, 0.0, height_cm)
    center = (0.0, 0.0, 0.0)
    for k in range(segments):
        a0 = 2 * np.pi * k / segments
        a1 = 2 * np.pi * (k + 1) / segments
        p0 = (radius_cm * np.cos(a0), radius_cm * np.sin(a0), 0.0)
        p1 = (radius_cm * np.cos(a1), radius_cm * np.sin(a1), 0.0)
        tris.append((p0, p1, apex))      # lateral
        tris.append((p1, p0, center))    # base
    with open(path, "wb") as out:
        out.write(b"\0" * 80)
        out.write(struct.pack("<I", len(tris)))
        for a, b, c in tris:
            n = np.cross(np.subtract(b, a), np.subtract(c, a))
            ln = np.linalg.norm(n)
            n = n / ln if ln > 0 else n
            out.write(struct.pack("<3f", *n))
            for p in (a, b, c):
                out.write(struct.pack("<3f", *p))
            out.write(struct.pack("<H", 0))


def write_unit_cube_dae(path):
    """COLLADA unit cube with a quad polylist and a 2-input stride (VERTEX +
    a dummy NORMAL input at offset 1)."""
    pos = [f"{x} {y} {z}" for x in (-0.5, 0.5) for y in (-0.5, 0.5)
           for z in (-0.5, 0.5)]
    # quads (1-based cube corners converted to 0-based indices)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    nrm = ["0 0 1"]
    p = " ".join(" ".join(f"{i} 0" for i in q) for q in quads)
    xml = f"""<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <library_geometries>
    <geometry id="cube" name="cube">
      <mesh>
        <source id="cube-pos">
          <float_array id="cube-pos-array" count="{len(pos) * 3}">{' '.join(pos)}</float_array>
          <technique_common>
            <accessor source="#cube-pos-array" count="{len(pos)}" stride="3">
              <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <source id="cube-nrm">
          <float_array id="cube-nrm-array" count="3">{' '.join(nrm)}</float_array>
        </source>
        <vertices id="cube-verts">
          <input semantic="POSITION" source="#cube-pos"/>
        </vertices>
        <polylist count="{len(quads)}">
          <input semantic="VERTEX" source="#cube-verts" offset="0"/>
          <input semantic="NORMAL" source="#cube-nrm" offset="1"/>
          <vcount>{' '.join('4' for _ in quads)}</vcount>
          <p>{p}</p>
        </polylist>
      </mesh>
    </geometry>
  </library_geometries>
</COLLADA>
"""
    with open(path, "w") as out:
        out.write(xml)


def write_transformed_cube_dae(path):
    """Gazebo-export-style COLLADA: centimeter units (<unit meter="0.01">)
    and a visual scene whose node chain carries a <matrix> translation, a
    nested node with <rotate>/<scale> in document order, and an
    <instance_node> indirection through library_nodes. A reader that
    ignores the header/scene (the pre-round-3 one) places the cube at the
    origin at 100x scale; the correct result is a 2 m x 1 m x 1 m box
    centered at (1, 0, 0) m:

        world = unit * Matrix(tx=100) @ Rz(90 deg) @ diag(2,1,1) @ v
        cube +-50 cm  ->  x in [0.5, 1.5], y in [-1, 1], z in [-0.5, 0.5]
    """
    pos = [f"{x} {y} {z}" for x in (-50.0, 50.0) for y in (-50.0, 50.0)
           for z in (-50.0, 50.0)]
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    p = " ".join(" ".join(str(i) for i in q) for q in quads)
    xml = f"""<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset>
    <unit meter="0.01" name="centimeter"/>
    <up_axis>Z_UP</up_axis>
  </asset>
  <library_geometries>
    <geometry id="cube" name="cube">
      <mesh>
        <source id="cube-pos">
          <float_array id="cube-pos-array" count="{len(pos) * 3}">{' '.join(pos)}</float_array>
          <technique_common>
            <accessor source="#cube-pos-array" count="{len(pos)}" stride="3">
              <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <vertices id="cube-verts">
          <input semantic="POSITION" source="#cube-pos"/>
        </vertices>
        <polylist count="{len(quads)}">
          <input semantic="VERTEX" source="#cube-verts" offset="0"/>
          <vcount>{' '.join('4' for _ in quads)}</vcount>
          <p>{p}</p>
        </polylist>
      </mesh>
    </geometry>
  </library_geometries>
  <library_nodes>
    <node id="cube-ref" name="cube-ref">
      <rotate>0 0 1 90</rotate>
      <scale>2 1 1</scale>
      <instance_geometry url="#cube"/>
    </node>
  </library_nodes>
  <library_visual_scenes>
    <visual_scene id="Scene" name="Scene">
      <node id="placed" name="placed">
        <matrix>1 0 0 100  0 1 0 0  0 0 1 0  0 0 0 1</matrix>
        <instance_node url="#cube-ref"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene>
    <instance_visual_scene url="#Scene"/>
  </scene>
</COLLADA>
"""
    with open(path, "w") as out:
        out.write(xml)


if __name__ == "__main__":
    write_unit_cube_obj(os.path.join(HERE, "unit_cube.obj"))
    write_cone_stl(os.path.join(HERE, "cone.stl"))
    write_unit_cube_dae(os.path.join(HERE, "unit_cube.dae"))
    write_transformed_cube_dae(os.path.join(HERE, "transformed_cube.dae"))
    print("assets written to", HERE)
