// Golden .vox fixture generator — a from-scratch re-implementation of the
// REFERENCE writer's byte layout (VR/Core/Private/SerializationManager.cpp:
// 22-46, VR/Scene/Private/Scene.cpp:314-460, VR/Voxel/Private/VoxelVolume.cpp
// :178-199, VR/Core/Private/Material.cpp:18-70, VR/Scene/Private/
// VoxelObject.cpp:37-65, Light.cpp/PointLight.cpp/SpotLight.cpp), compiled
// and run ONCE to produce tests/fixtures/reference_layout.vox.  The binary
// fixture is committed; this source documents how it was made.
//
// Deliberately mirrors the reference's quirks:
//  - properties live in an unordered_map, so the on-disk property order is
//    implementation-defined, NOT insertion order (the reader must be
//    order-independent),
//  - VVoxel is {uint8 Material; float Density;} with natural alignment
//    (sizeof == 8, 3 pad bytes),
//  - VQuat is a bare Eigen::Quaternionf memcpy -> (x,y,z,w) floats,
//  - the Material writer stores the ALBEDO path into the "RMTexture"
//    property (Material.cpp:58 uses AlbedoTexturePath again).
//
// Build: g++ -std=c++17 -O2 gen_vox_fixture.cpp -o gen_vox && ./gen_vox out.vox

#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

struct Node {
    std::vector<char> buffer;
    std::unordered_map<std::string, std::shared_ptr<Node>> props;
};

using P = std::shared_ptr<Node>;

static P node() { return std::make_shared<Node>(); }

template <typename T>
static P from(const T& v) {
    P n = node();
    n->buffer.resize(sizeof(T));
    std::memcpy(n->buffer.data(), &v, sizeof(T));
    return n;
}

static P from_str(const std::string& s) {
    P n = node();
    n->buffer.resize(s.size() + 1);
    std::memcpy(n->buffer.data(), s.c_str(), s.size() + 1);
    return n;
}

static void write_node(const P& n, std::ofstream& out) {
    uint64_t size = n->buffer.size();
    out.write(reinterpret_cast<char*>(&size), 8);
    if (size) out.write(n->buffer.data(), size);
    uint64_t nprops = n->props.size();
    out.write(reinterpret_cast<char*>(&nprops), 8);
    for (const auto& kv : n->props) {
        uint64_t nlen = kv.first.size() + 1;
        out.write(reinterpret_cast<char*>(&nlen), 8);
        out.write(kv.first.c_str(), nlen);
        write_node(kv.second, out);
    }
}

// ---- reference struct layouts ------------------------------------------
struct VVoxel {            // VR/Voxel/Public/Voxel.h:23-30
    uint8_t Material = 0;  // 3 pad bytes follow under natural alignment
    float Density = 30.0f;
};
static_assert(sizeof(VVoxel) == 8, "VVoxel layout");

struct VVector { float X, Y, Z; };
struct VVector2D { float X, Y; };
struct VQuat { float X, Y, Z, W; };   // Eigen::Quaternionf coeffs order
struct VColor { float R, G, B, A; };

static P material_archive() {
    P m = node();
    m->props["Color"] = from(VColor{0.25f, 0.5f, 0.75f, 1.0f});
    m->props["Roughness"] = from(0.4f);
    m->props["Metallic"] = from(0.6f);
    m->props["TextureScale"] = from(VVector2D{100.0f, 50.0f});
    m->props["AlbedoTexture"] = from_str("tex/albedo.png");
    m->props["NormalTexture"] = from_str("tex/normal.png");
    // reference bug: the RMTexture property gets the ALBEDO path
    m->props["RMTexture"] = from_str("tex/albedo.png");
    return m;
}

static P trs_archive(VVector pos, VVector scale, VQuat rot) {
    P o = node();
    o->props["Position"] = from(pos);
    o->props["Scale"] = from(scale);
    o->props["Rotation"] = from(rot);
    return o;
}

int main(int argc, char** argv) {
    const char* path = argc > 1 ? argv[1] : "reference_layout.vox";

    // ---- volume: resolution 2 -> n = 2^2+1 = 5, 125 voxels --------------
    const int n = 5;
    std::vector<VVoxel> voxels(n * n * n);
    // flat order is Index3DTo1D = x*n^2 + z*n + y  (x-major, then z, then y)
    for (int x = 0; x < n; x++)
        for (int y = 0; y < n; y++)
            for (int z = 0; z < n; z++) {
                int flat = x * n * n + z * n + y;
                voxels[flat].Density = float(x) - float(y) * 0.5f
                                       + float(z) * 0.25f - 1.0f;
                voxels[flat].Material = uint8_t((x + 2 * y + 3 * z) % 7);
            }
    P vol = node();
    vol->buffer.resize(voxels.size() * sizeof(VVoxel));
    std::memcpy(vol->buffer.data(), voxels.data(), vol->buffer.size());
    uint8_t resolution = 2;
    vol->props["Resolution"] = from(resolution);
    vol->props["Extends"] = from(120.0f);
    vol->props["Material"] = material_archive();

    // ---- scene ----------------------------------------------------------
    P scene = node();
    uint64_t one = 1;
    scene->props["VCount"] = from(one);
    scene->props["V_0"] = vol;

    scene->props["OCount"] = from(one);
    uint64_t zero = 0;
    scene->props["OI_0"] = from(zero);
    scene->props["O_0"] = trs_archive(
        VVector{10.0f, -20.0f, 30.0f}, VVector{1.0f, 2.0f, 0.5f},
        VQuat{0.0f, 0.0f, 0.7071068f, 0.7071068f});

    scene->props["LDCount"] = from(one);
    P ld = trs_archive(VVector{0, 0, 0}, VVector{1, 1, 1},
                       VQuat{0.1f, 0.2f, 0.3f, 0.9273618f});
    ld->props["Color"] = from(VColor{1, 1, 1, 1});
    ld->props["Strength"] = from(6.0f);
    scene->props["LD_0"] = ld;

    scene->props["LPCount"] = from(one);
    P lp = trs_archive(VVector{5, 6, 7}, VVector{1, 1, 1},
                       VQuat{0, 0, 0, 1});
    lp->props["Color"] = from(VColor{1.0f, 0.5f, 0.25f, 1.0f});
    lp->props["Strength"] = from(80.0f);
    lp->props["AttL"] = from(0.5f);
    lp->props["AttExp"] = from(0.005f);
    scene->props["LP_0"] = lp;

    scene->props["LSCount"] = from(one);
    P ls = trs_archive(VVector{-3, 0, 9}, VVector{1, 1, 1},
                       VQuat{0, 0.3826834f, 0, 0.9238795f});
    ls->props["Color"] = from(VColor{0.2f, 0.4f, 0.9f, 1.0f});
    ls->props["Strength"] = from(40.0f);
    ls->props["AttL"] = from(0.5f);
    ls->props["AttExp"] = from(0.005f);
    ls->props["AngleF"] = from(20.0f);
    ls->props["Angle"] = from(45.0f);
    scene->props["LS_0"] = ls;

    std::ofstream out(path, std::ios::binary);
    write_node(scene, out);
    return 0;
}
