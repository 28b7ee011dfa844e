"""Drive openobj_tpu through its public package boundary:
fit a 2-object stacked field to an analytic scene (sphere at origin r=0.5,
second object sphere at x=2 r=0.3), rays from a ring of cameras; verify the
rendered depth converges toward GT and loss decreases."""
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np
from openobj_tpu.models import object_field
from openobj_tpu.core import optim
from openobj_tpu.ops import losses, sampling, rendering

O, R, P = 2, 256, 10
centers = np.array([[0.,0.,0.],[2.,0.,0.]]); radii = np.array([0.5, 0.3])

def make_rays(key, o):
    # cameras on a ring of radius 2 around each object center, looking inward
    k1,k2 = jax.random.split(key)
    ang = jax.random.uniform(k1,(R,))*2*np.pi
    cam = jnp.stack([jnp.cos(ang),jnp.sin(ang),jnp.zeros_like(ang)],-1)*2.0 + centers[o]
    # aim at random point inside sphere for this-object rays
    tgt = centers[o] + jax.random.normal(k2,(R,3))*radii[o]*0.3
    d = tgt - cam; d = d/jnp.linalg.norm(d,axis=-1,keepdims=True)
    # analytic ray-sphere depth
    oc = cam - centers[o]
    b = jnp.sum(oc*d,-1); c = jnp.sum(oc*oc,-1)-radii[o]**2
    disc = b*b-c; hit = disc>0
    t = -b - jnp.sqrt(jnp.maximum(disc,0.0))
    depth = jnp.where(hit, t, 0.0)
    return cam, d, depth, hit

key = jax.random.PRNGKey(1)
params = object_field.init_stacked_fields(key, O, hidden=32, clip_size=8, scale=2.0)
ostate = optim.init_adamw_state(params, n_slots=O)
active = jnp.array([True, True])
gt_color_val = jnp.array([[0.8,0.2,0.1],[0.1,0.6,0.9]])

@jax.jit
def step(params, ostate, key):
    ks = jax.random.split(key, 2*O+1)
    cams, ds, depths, states = [],[],[],[]
    for o in range(O):
        c,d,dep,hit = make_rays(ks[o], o)
        cams.append(c); ds.append(d); depths.append(dep)
        states.append(jnp.where(hit,1,0))
    cam=jnp.stack(cams); d=jnp.stack(ds); depth=jnp.stack(depths); state=jnp.stack(states)
    z = jax.vmap(lambda k,dp,st: sampling.sample_z_values(k,dp,st,0.0,1,9,0.1,0.05))(ks[O:2*O],depth,state)
    pts = sampling.rays_to_points(cam,d,z,obj_center=centers[:,None,None,:])
    def loss_fn(p):
        a,c_,f = object_field.field_apply_stacked(p, pts)
        gt_c = jnp.broadcast_to(gt_color_val[:,None,:],(O,R,3))
        t,per = losses.step_batch_loss(a[...,0], c_, depth, gt_c, state, z, active=active)
        return t
    l, g = jax.value_and_grad(loss_fn)(params)
    params, ostate = optim.adamw_update(params,g,ostate,lr=1e-3,weight_decay=0.013,active=active)
    return params, ostate, l

ls=[]
for i in range(300):
    key,sk = jax.random.split(key)
    params,ostate,l = step(params,ostate,sk)
    if i%50==0: ls.append(float(l))
print("loss trajectory:", [round(x,3) for x in ls])

# eval: render depth on fresh rays, compare to analytic GT
key=jax.random.PRNGKey(99)
cam,d,dep_gt,hit = make_rays(key,0)
z = jnp.broadcast_to(jnp.linspace(0.8,2.5,64),(R,64))
pts = sampling.rays_to_points(cam,d,z,obj_center=centers[0])
a,c_,_ = object_field.field_apply(object_field.slice_slot(params,0), pts)
occ = rendering.occupancy_activation(a[...,0])
w = rendering.occupancy_to_termination(occ)
rd = rendering.render(w,z)
err = np.abs(np.asarray(rd - dep_gt))[np.asarray(hit)]
print(f"depth MAE on held-out rays (obj0): {err.mean():.4f} m   (GT depth ~{float(dep_gt[hit].mean()):.2f})")
rc = rendering.render(w[...,None], c_, axis=-2)
cerr = np.abs(np.asarray(rc) - np.array([0.8,0.2,0.1])).mean()
print(f"color MAE: {cerr:.4f}")
assert ls[0] > ls[-1]*2, "loss did not drop"
assert err.mean() < 0.15, "depth did not converge"
assert cerr < 0.1, "color did not converge"
print("CONVERGED OK")
