"""Interactive reconstruction viewer — self-contained HTML export.

Counterpart of the reference's interactive Open3D visualizer
(`mv3d/eval/visualizer.py`): cycle scenes (D/X), cycle methods (V/G),
toggle the GT mesh (C/F), toggle the prediction (N/J), with per-method
metrics shown for the active selection.  This environment (and most TPU
pods) has no display or Open3D, so instead of an on-host GL window the
eval results export to ONE self-contained HTML file — vanilla WebGL, zero
external dependencies, meshes/point clouds embedded base64 — that opens
anywhere.

Usage (mirrors the reference's `parent_dirs`/`ply_filenames` lists):

    from tdvnet.eval.export_viewer import export_viewer
    export_viewer(
        method_dirs=[("3dvnet", "results/3dvnet/scenes",
                      "fused_0.010_3v_masked.ply",
                      "metrics_3d_0.010_3v_masked.json"), ...],
        scene_dirs=["/data/scenes/scene0707_00", ...],
        out_html="viewer.html")
"""
from __future__ import annotations

import base64
import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from tdvnet.ops import ply

MAX_POINTS = 400_000          # decimation cap per embedded object


def _pack_object(verts: np.ndarray, faces: Optional[np.ndarray],
                 colors: Optional[np.ndarray]) -> dict:
    """Decimate + base64-pack one geometry for embedding."""
    verts = np.asarray(verts, np.float32)
    if faces is not None and len(faces):
        faces = np.asarray(faces, np.uint32)
        # triangle soup with flat normals: WebGL 1 has no 32-bit index
        # guarantee, and flat shading needs per-face normals anyway
        if faces.shape[0] * 3 > MAX_POINTS * 2:
            keep = np.linspace(0, faces.shape[0] - 1,
                               MAX_POINTS * 2 // 3).astype(np.int64)
            faces = faces[keep]
        tri = verts[faces.reshape(-1)]                      # [F*3, 3]
        e1 = tri[1::3] - tri[0::3]
        e2 = tri[2::3] - tri[0::3]
        n = np.cross(e1, e2)
        n /= (np.linalg.norm(n, axis=1, keepdims=True) + 1e-12)
        normals = np.repeat(n, 3, axis=0).astype(np.float32)
        return {"kind": "mesh",
                "pos": base64.b64encode(tri.tobytes()).decode(),
                "nrm": base64.b64encode(normals.tobytes()).decode(),
                "n": int(tri.shape[0])}
    if verts.shape[0] > MAX_POINTS:
        keep = np.random.RandomState(0).choice(verts.shape[0], MAX_POINTS,
                                               replace=False)
        verts = verts[keep]
        colors = colors[keep] if colors is not None else None
    obj = {"kind": "points",
           "pos": base64.b64encode(verts.tobytes()).decode(),
           "n": int(verts.shape[0])}
    if colors is not None:
        c = np.asarray(colors)
        if c.dtype != np.uint8:
            c = np.clip(c * 255.0, 0, 255).astype(np.uint8)
        obj["col"] = base64.b64encode(np.ascontiguousarray(c[:, :3])
                                      .tobytes()).decode()
    return obj


def _metrics_text(scene_res_dir: str, metrics_name: str) -> str:
    lines = []
    p3 = os.path.join(scene_res_dir, metrics_name)
    if os.path.exists(p3):
        m = json.load(open(p3))
        lines += [f"{k}: {m[k]:.3f}" for k in ("fscore", "prec", "recal")
                  if k in m]
    p2 = os.path.join(scene_res_dir, "metrics_2d.json")
    if os.path.exists(p2):
        m = json.load(open(p2))
        lines += [f"{k}: {m[k]:.3f}" for k in ("abs_rel", "abs_diff")
                  if k in m]
    return "  ".join(lines) or "no metrics"


def export_viewer(method_dirs: Sequence[Tuple[str, str, str, str]],
                  scene_dirs: Sequence[str], out_html: str) -> str:
    """method_dirs: (label, scenes_root, ply_filename, metrics_filename)
    per method — the reference's parent_dirs/ply_filenames/
    metrics_filenames triple (`mv3d/eval/visualizer.py:10-24`).
    scene_dirs: dataset scene dirs (for `info.json` → GT mesh).
    Returns out_html."""
    scenes: List[dict] = []
    for sdir in scene_dirs:
        sname = os.path.basename(sdir)
        entry = {"name": sname, "methods": [], "gt": None}
        info_p = os.path.join(sdir, "info.json")
        if os.path.exists(info_p):
            info = json.load(open(info_p))
            gt_p = info.get("gt_mesh")
            if gt_p and os.path.exists(gt_p):
                v, f, c = ply.read_ply(gt_p)
                entry["gt"] = _pack_object(v, f, c)
        for label, root, ply_name, met_name in method_dirs:
            res = os.path.join(root, sname)
            p = os.path.join(res, ply_name)
            if not os.path.exists(p):
                continue
            v, f, c = ply.read_ply(p)
            obj = _pack_object(v, f, c)
            obj["label"] = label
            obj["metrics"] = _metrics_text(res, met_name)
            entry["methods"].append(obj)
        if entry["methods"] or entry["gt"] is not None:
            scenes.append(entry)
    if not scenes:
        raise ValueError("no reconstructions found to export")

    payload = json.dumps(scenes)
    html = _TEMPLATE.replace("__DATA__", payload)
    os.makedirs(os.path.dirname(os.path.abspath(out_html)), exist_ok=True)
    with open(out_html, "w") as f:
        f.write(html)
    return out_html


_TEMPLATE = r"""<!doctype html>
<html><head><meta charset="utf-8"><title>tdvnet viewer</title><style>
 body{margin:0;overflow:hidden;background:#181818;font:13px monospace;color:#ddd}
 #hud{position:fixed;top:8px;left:8px;white-space:pre;pointer-events:none;
      text-shadow:0 0 4px #000}
 #help{position:fixed;bottom:8px;left:8px;color:#888;text-shadow:0 0 4px #000}
</style></head><body>
<canvas id="c"></canvas><div id="hud"></div>
<div id="help">drag: orbit | wheel: zoom | shift-drag: pan | D/X scene | V/G method | N/J pred on/off | C/F gt on/off</div>
<script>
const DATA = __DATA__;
let sIdx=0, mIdx=0, showPred=true, showGT=false;
const cv=document.getElementById('c');
const gl=cv.getContext('webgl');
const hud=document.getElementById('hud');

function b2f(b){const s=atob(b),a=new Uint8Array(s.length);
 for(let i=0;i<s.length;i++)a[i]=s.charCodeAt(i);return new Float32Array(a.buffer);}
function b2u8(b){const s=atob(b),a=new Uint8Array(s.length);
 for(let i=0;i<s.length;i++)a[i]=s.charCodeAt(i);return a;}

function sh(type,src){const s=gl.createShader(type);gl.shaderSource(s,src);
 gl.compileShader(s);if(!gl.getShaderParameter(s,gl.COMPILE_STATUS))
 throw gl.getShaderInfoLog(s);return s;}
function prog(vs,fs){const p=gl.createProgram();
 gl.attachShader(p,sh(gl.VERTEX_SHADER,vs));
 gl.attachShader(p,sh(gl.FRAGMENT_SHADER,fs));gl.linkProgram(p);return p;}

const PV=`attribute vec3 pos;attribute vec3 col;uniform mat4 mvp;
 varying vec3 vc;void main(){gl_Position=mvp*vec4(pos,1.);gl_PointSize=2.;vc=col;}`;
const PF=`precision mediump float;varying vec3 vc;
 void main(){gl_FragColor=vec4(vc,1.);}`;
const MV=`attribute vec3 pos;attribute vec3 nrm;uniform mat4 mvp;uniform vec3 tint;
 varying vec3 vc;void main(){gl_Position=mvp*vec4(pos,1.);
 float l=.25+.75*abs(dot(normalize(nrm),normalize(vec3(.5,.6,1.))));vc=tint*l;}`;
const pProg=prog(PV,PF), mProg=prog(MV,PF);

function upload(obj){
 if(obj.gl)return obj.gl;
 const o={n:obj.n,kind:obj.kind};
 o.pos=gl.createBuffer();gl.bindBuffer(gl.ARRAY_BUFFER,o.pos);
 gl.bufferData(gl.ARRAY_BUFFER,b2f(obj.pos),gl.STATIC_DRAW);
 if(obj.kind==='mesh'){o.nrm=gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER,o.nrm);
  gl.bufferData(gl.ARRAY_BUFFER,b2f(obj.nrm),gl.STATIC_DRAW);}
 else{o.col=gl.createBuffer();gl.bindBuffer(gl.ARRAY_BUFFER,o.col);
  let cols;if(obj.col){const u=b2u8(obj.col);cols=new Float32Array(u.length);
   for(let i=0;i<u.length;i++)cols[i]=u[i]/255;}
  else{cols=new Float32Array(obj.n*3);cols.fill(0.75);}
  gl.bufferData(gl.ARRAY_BUFFER,cols,gl.STATIC_DRAW);}
 obj.gl=o;return o;}

function bounds(obj){const p=b2f(obj.pos);
 const lo=[1e9,1e9,1e9],hi=[-1e9,-1e9,-1e9];
 for(let i=0;i<p.length;i+=3)for(let k=0;k<3;k++){
  if(p[i+k]<lo[k])lo[k]=p[i+k];if(p[i+k]>hi[k])hi[k]=p[i+k];}
 return [lo,hi];}

let center=[0,0,0],dist=5,theta=0.6,phi=1.0,pan=[0,0,0];
function fit(){const sc=DATA[sIdx];
 const ref=sc.gt||(sc.methods[mIdx]);if(!ref)return;
 const[lo,hi]=bounds(ref);
 center=[(lo[0]+hi[0])/2,(lo[1]+hi[1])/2,(lo[2]+hi[2])/2];
 dist=1.6*Math.max(hi[0]-lo[0],hi[1]-lo[1],hi[2]-lo[2],0.5);pan=[0,0,0];}

function mat(){
 const a=cv.width/cv.height,f=1/Math.tan(0.4),zn=0.05,zf=1000;
 const eye=[center[0]+pan[0]+dist*Math.sin(phi)*Math.cos(theta),
            center[1]+pan[1]+dist*Math.sin(phi)*Math.sin(theta),
            center[2]+pan[2]+dist*Math.cos(phi)];
 const at=[center[0]+pan[0],center[1]+pan[1],center[2]+pan[2]];
 const up=[0,0,1];
 function sub(u,v){return[u[0]-v[0],u[1]-v[1],u[2]-v[2]];}
 function cr(u,v){return[u[1]*v[2]-u[2]*v[1],u[2]*v[0]-u[0]*v[2],u[0]*v[1]-u[1]*v[0]];}
 function nm(u){const l=Math.hypot(u[0],u[1],u[2])||1;return[u[0]/l,u[1]/l,u[2]/l];}
 const z=nm(sub(eye,at)),x=nm(cr(up,z)),y=cr(z,x);
 const d=[-x[0]*eye[0]-x[1]*eye[1]-x[2]*eye[2],
          -y[0]*eye[0]-y[1]*eye[1]-y[2]*eye[2],
          -z[0]*eye[0]-z[1]*eye[1]-z[2]*eye[2]];
 // column-major mvp = P*V
 const P=[f/a,0,0,0, 0,f,0,0, 0,0,(zf+zn)/(zn-zf),-1, 0,0,2*zf*zn/(zn-zf),0];
 const V=[x[0],y[0],z[0],0, x[1],y[1],z[1],0, x[2],y[2],z[2],0, d[0],d[1],d[2],1];
 const M=new Float32Array(16);
 for(let i=0;i<4;i++)for(let j=0;j<4;j++){let s=0;
  for(let k=0;k<4;k++)s+=P[k*4+j]*V[i*4+k];M[i*4+j]=s;}
 return M;}

function drawObj(obj,tint){const o=upload(obj),m=mat();
 if(o.kind==='mesh'){gl.useProgram(mProg);
  gl.uniformMatrix4fv(gl.getUniformLocation(mProg,'mvp'),false,m);
  gl.uniform3fv(gl.getUniformLocation(mProg,'tint'),tint);
  const ap=gl.getAttribLocation(mProg,'pos');gl.enableVertexAttribArray(ap);
  gl.bindBuffer(gl.ARRAY_BUFFER,o.pos);gl.vertexAttribPointer(ap,3,gl.FLOAT,false,0,0);
  const an=gl.getAttribLocation(mProg,'nrm');gl.enableVertexAttribArray(an);
  gl.bindBuffer(gl.ARRAY_BUFFER,o.nrm);gl.vertexAttribPointer(an,3,gl.FLOAT,false,0,0);
  gl.drawArrays(gl.TRIANGLES,0,o.n);}
 else{gl.useProgram(pProg);
  gl.uniformMatrix4fv(gl.getUniformLocation(pProg,'mvp'),false,m);
  const ap=gl.getAttribLocation(pProg,'pos');gl.enableVertexAttribArray(ap);
  gl.bindBuffer(gl.ARRAY_BUFFER,o.pos);gl.vertexAttribPointer(ap,3,gl.FLOAT,false,0,0);
  const ac=gl.getAttribLocation(pProg,'col');gl.enableVertexAttribArray(ac);
  gl.bindBuffer(gl.ARRAY_BUFFER,o.col);gl.vertexAttribPointer(ac,3,gl.FLOAT,false,0,0);
  gl.drawArrays(gl.POINTS,0,o.n);}}

function render(){
 cv.width=innerWidth;cv.height=innerHeight;gl.viewport(0,0,cv.width,cv.height);
 gl.enable(gl.DEPTH_TEST);gl.clearColor(0.09,0.09,0.09,1);
 gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
 const sc=DATA[sIdx];
 if(showGT&&sc.gt)drawObj(sc.gt,[0.55,0.55,0.6]);
 const m=sc.methods[mIdx];
 if(showPred&&m)drawObj(m,[0.85,0.7,0.4]);
 hud.textContent=`scene ${sIdx+1}/${DATA.length}: ${sc.name}\n`+
  (m?`method ${mIdx+1}/${sc.methods.length}: ${m.label}`+
     (showPred?'':' (hidden)')+`\n${m.metrics}`:'no methods')+
  (sc.gt?`\nGT mesh: ${showGT?'on':'off'}`:'\nGT mesh: unavailable');}

let drag=false,px=0,py=0,shift=false;
cv.onmousedown=e=>{drag=true;px=e.clientX;py=e.clientY;shift=e.shiftKey;};
onmouseup=()=>drag=false;
onmousemove=e=>{if(!drag)return;const dx=e.clientX-px,dy=e.clientY-py;
 px=e.clientX;py=e.clientY;
 if(shift){pan[0]-=dx*dist*0.001;pan[2]+=dy*dist*0.001;}
 else{theta-=dx*0.008;phi=Math.min(3.0,Math.max(0.12,phi-dy*0.008));}
 render();};
onwheel=e=>{dist*=Math.exp(e.deltaY*0.001);render();};
onkeydown=e=>{const k=e.key.toLowerCase();const sc=DATA[sIdx];
 if(k==='d'){sIdx=(sIdx+1)%DATA.length;mIdx=0;fit();}
 else if(k==='x'){sIdx=(sIdx-1+DATA.length)%DATA.length;mIdx=0;fit();}
 else if(k==='v'&&sc.methods.length)mIdx=(mIdx+1)%sc.methods.length;
 else if(k==='g'&&sc.methods.length)mIdx=(mIdx-1+sc.methods.length)%sc.methods.length;
 else if(k==='n')showPred=true; else if(k==='j')showPred=false;
 else if(k==='c')showGT=true;  else if(k==='f')showGT=false;
 else return; render();};
onresize=render;
fit();render();
</script></body></html>
"""
