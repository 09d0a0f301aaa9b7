#include <cstdio>
#include <cstddef>
#include <nanovdb/NanoVDB.h>
#include <nanovdb/util/GridBuilder.h>
#include <nanovdb/util/IO.h>
#include <nanovdb/util/Primitives.h>
using namespace nanovdb;
int main(int argc, char** argv) {
    using RootT = NanoRoot<float>;
    using RootD = typename RootT::DataType;
    using Upper = typename RootT::ChildNodeType;
    using Lower = typename Upper::ChildNodeType;
    using UpperD = typename Upper::DataType;
    using LowerD = typename Lower::DataType;
    using LeafD = typename NanoLeaf<float>::DataType;
    printf("RootData: bbox=%zu avc=%zu tileCount=%zu background=%zu sizeof=%zu tileSize=%zu tile.key=%zu tile.childID=%zu tile.value=%zu\n",
        offsetof(RootD, mBBox), offsetof(RootD, mActiveVoxelCount), offsetof(RootD, mTileCount),
        offsetof(RootD, mBackground), sizeof(RootD), sizeof(RootD::Tile),
        offsetof(RootD::Tile, key), offsetof(RootD::Tile, childID), offsetof(RootD::Tile, value));
    printf("UpperData: bbox=%zu offset=%zu vmask=%zu cmask=%zu table=%zu sizeof=%zu\n",
        offsetof(UpperD, mBBox), offsetof(UpperD, mOffset), offsetof(UpperD, mValueMask),
        offsetof(UpperD, mChildMask), offsetof(UpperD, mTable), sizeof(UpperD));
    printf("LowerData: bbox=%zu offset=%zu vmask=%zu cmask=%zu table=%zu sizeof=%zu\n",
        offsetof(LowerD, mBBox), offsetof(LowerD, mOffset), offsetof(LowerD, mValueMask),
        offsetof(LowerD, mChildMask), offsetof(LowerD, mTable), sizeof(LowerD));
    printf("LeafData: bboxmin=%zu flags=%zu vmask=%zu min=%zu values=%zu sizeof=%zu\n",
        offsetof(LeafD, mBBoxMin), offsetof(LeafD, mFlags), offsetof(LeafD, mValueMask),
        offsetof(LeafD, mMinimum), offsetof(LeafD, mValues), sizeof(LeafD));
    if (argc > 1) {
        auto handle = createFogVolumeSphere<float>(0.8f, Vec3d(0.0), 1.0/16.0, 3.0, Vec3d(0), "sphere_fog");
        io::writeGrid(argv[1], handle, io::Codec::NONE);
        auto* grid = handle.grid<float>();
        auto& tree = grid->tree();
        printf("asset: voxels=%llu leaves=%u lower=%u upper=%u gridSize=%llu voxelSize=%f\n",
               (unsigned long long)grid->activeVoxelCount(), tree.nodeCount(0), tree.nodeCount(1),
               tree.nodeCount(2), (unsigned long long)grid->gridSize(), grid->voxelSize()[0]);
        // print a couple of ground-truth samples for the parser test
        auto acc = grid->getAccessor();
        for (int i : {0, 4, 8, 12}) {
            printf("gt %d %d %d = %f\n", i, i/2, -i, acc.getValue(Coord(i, i/2, -i)));
        }
    }
    return 0;
}
